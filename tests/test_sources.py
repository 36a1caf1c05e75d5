"""Source-layer tests: split cache (scan-parallelism ingest step) and
table memoization."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from sample_iceberg_schema_evolution_pyiceberg_spark import sources


def test_split_cache_preserves_rows_and_order(tmp_path, monkeypatch):
    """The split cache must be a pure re-layout: same rows, same order,
    same schema — just more files."""
    monkeypatch.setattr(sources, "_SPLIT_CACHE_DIR", str(tmp_path / "cache"))
    n = 50_000
    table = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "v": pa.array([f"row-{i}" for i in range(n)], pa.string()),
        }
    )
    src = tmp_path / "one_group.parquet"
    # row_group_size >= n -> a single row group, the layout that
    # motivates the cache
    pq.write_table(table, src, row_group_size=n)
    assert pq.ParquetFile(src).metadata.num_row_groups == 1

    dst = sources._split_cached_path(str(src))
    assert dst != str(src)
    files = sorted(p for p in (tmp_path / "cache").glob("*/part-*.parquet"))
    assert len(files) > 1
    rebuilt = pa.concat_tables([pq.read_table(f) for f in files])
    assert rebuilt.equals(table)

    # second call hits the cache (same path returned, no rebuild)
    assert sources._split_cached_path(str(src)) == dst


def test_split_cache_skips_small_files(tmp_path, monkeypatch):
    monkeypatch.setattr(sources, "_SPLIT_CACHE_DIR", str(tmp_path / "cache"))
    table = pa.table({"k": pa.array(range(100), pa.int64())})
    src = tmp_path / "small.parquet"
    pq.write_table(table, src)
    assert sources._split_cached_path(str(src)) == str(src)


def test_split_cache_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPLIT_CACHE", "0")
    table = pa.table({"k": pa.array(range(100_000), pa.int64())})
    src = tmp_path / "big.parquet"
    pq.write_table(table, src, row_group_size=100_000)
    assert sources._split_cached_path(str(src)) == str(src)


def test_load_table_memoized(spark, sf_dir):
    a = sources.load_table(spark, sf_dir, "nation")
    b = sources.load_table(spark, sf_dir, "nation")
    assert a is b
