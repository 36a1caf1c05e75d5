"""Full CDC changelog scan (``LakeTable.changelog_between`` — the
Iceberg create_changelog_view / Delta change-data-feed analog).

Coverage: per-commit emission for every snapshot kind (append, MoR
predicate delete, MoR equality delete + re-append, copy-on-write
UPDATE, overwrite, compaction), the replay invariant (state(from) +
changelog == state(to) as multisets), range endpoints/refs, and the
expired-pre-state refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
    LakeCatalog,
    TableFormatError,
)

CDC_COLS = ["_change_ordinal", "_snapshot_id", "_change_type"]


@pytest.fixture()
def catalog(tmp_path):
    return LakeCatalog(tmp_path / "wh")


def _mk(spark, catalog, name="cl"):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    table = catalog.create_table("db", name, df.schema)
    return table, df


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def _replay(table, spark, from_snapshot, to_snapshot):
    """Assert the replay invariant: applying the changelog's deletes
    and inserts (multiset semantics) to state(from) yields state(to)."""
    log = table.changelog_between(
        spark, from_snapshot=from_snapshot, to_snapshot=to_snapshot
    )
    base = (
        table.to_df(spark, as_of_snapshot=from_snapshot)
        if from_snapshot
        else spark.createDataFrame([], table.schema)
    )
    dels = log.filter("_change_type = 'delete'").drop(*CDC_COLS)
    ins = log.filter("_change_type = 'insert'").drop(*CDC_COLS)
    # multiset fold: final = base + sum(inserts) - sum(deletes). The
    # per-ordinal order doesn't matter because every delete image is
    # present in its commit's pre-state, so counts never go negative.
    replayed = base.unionByName(ins).exceptAll(dels)
    target = table.to_df(spark, as_of_snapshot=to_snapshot)
    assert replayed.exceptAll(target).count() == 0
    assert target.exceptAll(replayed).count() == 0


def test_appends_emit_inserts_with_ordinals(spark, catalog):
    table, df = _mk(spark, catalog)
    s1 = table.append(df.filter("id < 40"))
    s2 = table.append(df.filter("id >= 40"))
    log = table.changelog_between(spark)
    got = {
        (r["_change_ordinal"], r["_snapshot_id"], r["_change_type"])
        for r in log.select(*CDC_COLS).distinct().collect()
    }
    assert got == {
        (0, s1.snapshot_id, "insert"),
        (1, s2.snapshot_id, "insert"),
    }
    assert log.count() == 100
    _replay(table, spark, None, s2.snapshot_id)


def test_mor_predicate_delete_emits_deleted_rows(spark, catalog):
    table, df = _mk(spark, catalog)
    s1 = table.append(df)
    sd = table.delete_where(spark, "k = 3", strategy="merge_on_read")
    # deletes = exactly the pre-state rows matching the predicate
    log = table.changelog_between(spark, from_snapshot=s1.snapshot_id)
    dels = log.filter("_change_type = 'delete'")
    assert _rows(dels.select("id", "k")) == _rows(
        df.filter("k = 3").select("id", "k")
    )
    assert dels.select("_snapshot_id").distinct().first()[0] \
        == sd.snapshot_id
    _replay(table, spark, s1.snapshot_id, sd.snapshot_id)


def test_mor_delete_does_not_mask_later_appends(spark, catalog):
    """SQL DELETE visibility: an append AFTER the predicate commit is
    untouched by it — the changelog's delete set must come from the
    pre-state only."""
    table, df = _mk(spark, catalog)
    table.append(df.filter("id < 50"))
    table.delete_where(spark, "k = 3", strategy="merge_on_read")
    s3 = table.append(df.filter("id >= 50"))  # k=3 rows here survive
    log = table.changelog_between(spark)
    dels = log.filter("_change_type = 'delete'")
    assert _rows(dels.select("id", "k")) == _rows(
        df.filter("id < 50 AND k = 3").select("id", "k")
    )
    _replay(table, spark, None, s3.snapshot_id)


def test_mor_merge_emits_delete_insert_pairs(spark, catalog):
    """Equality-delete MERGE: affected keys' old versions emit as
    deletes (from the key file), the re-appended post-images as
    inserts — the update-as-delete+insert changelog shape."""
    table, df = _mk(spark, catalog)
    s1 = table.append(df)
    src = spark.range(90, 110).select(
        F.col("id"), F.lit(99).alias("k")
    )
    table.merge_into(
        spark, src, ["id"],
        when_matched_update={"k": "s_k"},
        strategy="merge_on_read",
    )
    log = table.changelog_between(spark, from_snapshot=s1.snapshot_id)
    dels = log.filter("_change_type = 'delete'")
    ins = log.filter("_change_type = 'insert'")
    # matched keys 90..99: old images deleted, new images inserted;
    # unmatched source 100..109 inserted
    assert _rows(dels.select("id", "k")) == _rows(
        df.filter("id >= 90").select("id", "k")
    )
    assert _rows(ins.select("id", "k")) == _rows(
        src.select("id", "k")
    )
    # delete ordinal precedes the paired insert ordinal
    assert (
        dels.select("_change_ordinal").distinct().first()[0]
        < ins.select("_change_ordinal").distinct().first()[0]
    )
    _replay(table, spark, s1.snapshot_id, None)


def test_cow_update_emits_net_diff(spark, catalog):
    """Copy-on-write UPDATE rewrites the whole live set; the changelog
    must net the carry-over rows and emit ONLY the changed images."""
    table, df = _mk(spark, catalog)
    s1 = table.append(df)
    su = table.update_where(
        spark, "k = 5", {"k": "k + 100"}, strategy="copy_on_write"
    )
    log = table.changelog_between(spark, from_snapshot=s1.snapshot_id)
    dels = log.filter("_change_type = 'delete'")
    ins = log.filter("_change_type = 'insert'")
    assert _rows(dels.select("id", "k")) == _rows(
        df.filter("k = 5").select("id", "k")
    )
    assert _rows(ins.select("id", "k")) == _rows(
        df.filter("k = 5").select("id", (F.col("k") + 100).alias("k"))
    )
    assert dels.count() + ins.count() < 100  # carry-overs netted
    _replay(table, spark, s1.snapshot_id, su.snapshot_id)


def test_overwrite_emits_diff(spark, catalog):
    table, df = _mk(spark, catalog)
    s1 = table.append(df)
    s2 = table.overwrite(df.filter("id >= 90"))
    log = table.changelog_between(
        spark, from_snapshot=s1.snapshot_id, to_snapshot=s2.snapshot_id
    )
    # 90 rows vanish, the 10 surviving rows are carry-overs (netted)
    assert log.filter("_change_type = 'delete'").count() == 90
    assert log.filter("_change_type = 'insert'").count() == 0
    _replay(table, spark, s1.snapshot_id, s2.snapshot_id)


def test_compaction_emits_nothing(spark, catalog):
    """compact() commits a 'replace' snapshot — content-preserving by
    label, so the changelog emits zero rows WITHOUT diffing states."""
    table, df = _mk(spark, catalog)
    table.append(df.filter("id < 40"))
    s2 = table.append(df.filter("id >= 40"))
    sc = table.compact(spark)
    assert sc.operation == "replace"
    log = table.changelog_between(spark, from_snapshot=s2.snapshot_id)
    assert log.count() == 0
    # and the full-range changelog still replays to the current state
    _replay(table, spark, None, sc.snapshot_id)


def test_mixed_episode_replays_end_to_end(spark, catalog):
    """The kitchen-sink lineage: append, append, MoR delete, append,
    compact, CoW update — one changelog spanning all of it replays."""
    table, df = _mk(spark, catalog)
    table.append(df.filter("id < 30"))
    table.append(df.filter("id >= 30 AND id < 60"))
    table.delete_where(spark, "k = 2", strategy="merge_on_read")
    table.append(df.filter("id >= 60"))
    table.compact(spark)
    last = table.update_where(spark, "k = 6", {"k": "k * 10"})
    _replay(table, spark, None, last.snapshot_id)
    # ordinals are strictly ordered by commit position
    log = table.changelog_between(spark)
    ords = [
        r["_change_ordinal"]
        for r in log.select("_change_ordinal").distinct()
        .orderBy("_change_ordinal").collect()
    ]
    assert ords == sorted(ords)


def test_changelog_range_endpoints_and_refs(spark, catalog):
    table, df = _mk(spark, catalog)
    s1 = table.append(df.filter("id < 50"))
    table.create_tag("v1")
    s2 = table.append(df.filter("id >= 50"))
    # tag resolves as a range endpoint
    log = table.changelog_between(spark, from_snapshot="v1")
    assert log.count() == 50
    assert log.select("_snapshot_id").distinct().first()[0] \
        == s2.snapshot_id
    # empty range
    assert table.changelog_between(
        spark, from_snapshot=s2.snapshot_id
    ).count() == 0
    with pytest.raises(TableFormatError):
        table.changelog_between(spark, from_snapshot="nope")
    with pytest.raises(TableFormatError):
        table.changelog_between(
            spark, from_snapshot=s2.snapshot_id,
            to_snapshot=s1.snapshot_id,
        )


def test_changelog_refuses_expired_pre_state(spark, catalog):
    """A delete commit whose predecessor was expired has no
    reconstructible pre-state — the changelog must refuse, not
    silently emit a wrong delete set."""
    table, df = _mk(spark, catalog)
    table.append(df.filter("id < 30"))
    table.append(df.filter("id >= 30 AND id < 60"))
    table.compact(spark)  # history: two appends now foldable
    s_live = table.snapshots[0]
    table.delete_where(spark, "k = 1", strategy="merge_on_read")
    # expire the history (age cutoff in the future = everything but
    # the retained last entry goes)
    import time as _time

    table.expire_snapshots(
        older_than_ms=int(_time.time() * 1000) + 10_000, retain_last=1
    )
    hist = table.all_snapshots()
    if not any(s.expired for s in hist):
        pytest.skip("expiration kept everything; nothing to assert")
    # a range whose delete commit's predecessor is expired must raise
    expired_ids = [s.snapshot_id for s in hist if s.expired]
    with pytest.raises(TableFormatError):
        table.changelog_between(spark, from_snapshot=expired_ids[0])
    # ranges fully inside retained history still work
    assert s_live.snapshot_id  # live rewrite retained


# ---------------------------------------------------------------------------
# apply_changelog: the CDC-consumer half (replication)
# ---------------------------------------------------------------------------


def _assert_same_state(a_df, b_df):
    assert a_df.exceptAll(b_df).count() == 0
    assert b_df.exceptAll(a_df).count() == 0


def test_apply_changelog_cow_replicates(spark, catalog):
    """Full-range changelog applied copy-on-write to an empty replica
    reproduces the source state across every commit kind."""
    src, df = _mk(spark, catalog, "src_cow")
    src.append(df.filter("id < 50"))
    src.delete_where(spark, "k = 3", strategy="merge_on_read")
    src.append(df.filter("id >= 50"))
    src.compact(spark)
    src.update_where(spark, "k = 6", {"k": "k * 10"})
    replica = catalog.create_table("db", "rep_cow", src.schema)
    snap = replica.apply_changelog(spark, src.changelog_between(spark))
    assert snap is not None and snap.operation == "overwrite"
    _assert_same_state(src.to_df(spark), replica.to_df(spark))


def test_apply_changelog_mor_incremental_sync(spark, catalog):
    """Keyed (merge-on-read) apply: two consecutive ranges sync a
    replica without ever rewriting it — each sync commits at most one
    equality-delete entry plus one append."""
    src, df = _mk(spark, catalog, "src_mor")
    s1 = src.append(df.filter("id < 50"))
    s2 = src.append(df.filter("id >= 50"))
    replica = catalog.create_table("db", "rep_mor", src.schema)
    # sync 1: the two appends
    replica.apply_changelog(
        spark,
        src.changelog_between(spark, to_snapshot=s2.snapshot_id),
        key_cols=["id"],
    )
    _assert_same_state(src.to_df(spark), replica.to_df(spark))
    # source mutates: CoW update + MoR delete
    src.update_where(spark, "k = 5", {"k": "k + 100"})
    last = src.delete_where(spark, "k = 1", strategy="merge_on_read")
    n_before = len(replica.snapshots)
    replica.apply_changelog(
        spark,
        src.changelog_between(spark, from_snapshot=s2.snapshot_id),
        key_cols=["id"],
    )
    _assert_same_state(src.to_df(spark), replica.to_df(spark))
    # O(delta): the sync appended commits (delete entry + append),
    # never rewrote the replica's live set
    added = replica.snapshots[n_before:]
    assert 1 <= len(added) <= 2
    assert all(not s.is_rewrite for s in added)
    assert any(s.delete_keys_dir for s in added)
    assert last.snapshot_id  # lineage anchor used above


def test_apply_changelog_keeps_identically_rewritten_rows(spark, catalog):
    """A merge-on-read MERGE that rewrites rows to IDENTICAL images
    emits delete+insert pairs of the same image; the keyed apply must
    keep those rows (latest-image-per-key), not let the pair cancel
    while the key mask deletes them."""
    src, df = _mk(spark, catalog, "src_ident")
    src.append(df)
    # same value formula as _mk: post-image == pre-image for all
    touched = spark.range(0, 10).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    src.merge_into(
        spark, touched, ["id"],
        when_matched_update={"k": "s_k"},
        insert_not_matched=False,
        strategy="merge_on_read",
    )
    log = src.changelog_between(spark)
    # precondition: the identical pairs really are in the log
    assert log.filter("_change_type = 'delete' AND id < 10").count() == 10
    replica = catalog.create_table("db", "rep_ident", src.schema)
    replica.apply_changelog(spark, log, key_cols=["id"])
    _assert_same_state(src.to_df(spark), replica.to_df(spark))
    assert replica.to_df(spark).filter("id < 10").count() == 10


def test_apply_changelog_validates_shape(spark, catalog):
    table, df = _mk(spark, catalog, "val")
    table.append(df)
    with pytest.raises(TableFormatError):
        table.apply_changelog(spark, df)  # no CDC columns
    log = table.changelog_between(spark)
    with pytest.raises(TableFormatError):
        table.apply_changelog(spark, log.drop("k"))  # missing data col
    with pytest.raises(TableFormatError):
        table.apply_changelog(spark, log, key_cols=["nope"])
    # empty changelog is a no-op
    empty = table.changelog_between(
        spark, from_snapshot=table.snapshots[-1].snapshot_id
    )
    assert table.apply_changelog(spark, empty, key_cols=["id"]) is None


# ---------------------------------------------------------------------------
# scd2_history: dimension-history build from a changelog
# ---------------------------------------------------------------------------


def test_scd2_history_intervals(spark, catalog):
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        scd2_history,
    )

    table, df = _mk(spark, catalog, "scd")
    table.append(df.filter("id < 20"))                       # ordinal 0
    table.update_where(spark, "k = 3", {"k": "k + 100"})     # ordinal 1
    table.delete_where(spark, "k = 5", strategy="merge_on_read")  # 2
    table.append(df.filter("id >= 20 AND id < 30"))          # ordinal 3
    hist = scd2_history(
        table.changelog_between(spark), ["id"]
    ).collect()
    by_id = {}
    for r in hist:
        by_id.setdefault(r["id"], []).append(r)
    # untouched row: one open interval from ordinal 0
    assert [(r["valid_from"], r["valid_to"], r["is_current"], r["k"])
            for r in by_id[0]] == [(0, None, True, 0)]
    # updated row (id=3, k 3->103): closed [0,1) + open [1,)
    ivs = sorted((r["valid_from"], r["valid_to"], r["k"]) for r in by_id[3])
    assert ivs == [(0, 1, 3), (1, None, 103)]
    # deleted row (id=5, k=5): closed [0,2), nothing current
    assert [(r["valid_from"], r["valid_to"], r["is_current"])
            for r in by_id[5]] == [(0, 2, False)]
    # late append: open interval from ordinal 3
    assert [(r["valid_from"], r["valid_to"]) for r in by_id[25]] \
        == [(3, None)]
    # exactly one current version per live key
    live_ids = {r["id"] for r in catalog.load_table("db", "scd")
                .to_df(spark).collect()}
    current = [r for r in hist if r["is_current"]]
    assert {r["id"] for r in current} == live_ids
    assert len(current) == len(live_ids)


def test_scd2_history_validates_shape(spark, catalog):
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        scd2_history,
    )

    table, df = _mk(spark, catalog, "scdv")
    with pytest.raises(TableFormatError):
        scd2_history(df, ["id"])


def test_changelog_across_schema_evolution(spark, catalog):
    """A changelog spanning an ADD COLUMN aligns every emission to the
    CURRENT schema: pre-evolution insert images null-fill the new
    column, post-evolution images carry it — and the replay invariant
    holds across the boundary."""
    import pyspark.sql.types as T

    table, df = _mk(spark, catalog, "evo")
    table.append(df.filter("id < 50"))
    new_schema = T.StructType(
        list(table.schema.fields) + [T.StructField("tag", T.StringType())]
    )
    table.commit_schema(new_schema)
    df2 = spark.range(50, 100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.lit("v2").alias("tag")
    )
    last = table.append(df2)
    table.delete_where(spark, "k = 3", strategy="merge_on_read_position")
    log = table.changelog_between(spark)
    assert set(log.columns) >= {"id", "k", "tag"}
    pre = log.filter("_change_type = 'insert' AND id < 50")
    assert pre.filter("tag IS NOT NULL").count() == 0  # null-filled
    post = log.filter("_change_type = 'insert' AND id >= 50")
    assert post.filter("tag = 'v2'").count() == 50
    _replay(table, spark, None, None if last is None else
            table.snapshots[-1].snapshot_id)


def test_changelog_replay_random_lineages(spark, tmp_path):
    """Property: for ANY mutation sequence (appends, copy-on-write and
    merge-on-read deletes of every granularity, updates, compactions),
    the full-range changelog replays to the final state. Randomized
    over seeded op sequences — the hand-written lineage tests above
    pin shapes; this sweeps the composition space."""
    import random

    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        LakeCatalog,
    )

    catalog = LakeCatalog(tmp_path / "wh_prop")
    base = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        table = catalog.create_table("db", f"prop{seed}", base.schema)
        cursor = 0

        def do_append():
            nonlocal cursor
            n = rng.randrange(10, 40)
            table.append(
                base.filter(f"id >= {cursor} AND id < {cursor + n}")
            )
            cursor += n

        do_append()  # lineages start with data
        ops = ["append", "cow_del", "mor_del", "pos_del", "upd",
               "pos_upd", "compact"]
        for _ in range(rng.randrange(4, 7)):
            op = rng.choice(ops)
            k = rng.randrange(7)
            if op == "append":
                do_append()
            elif op == "cow_del":
                table.delete_where(spark, f"k = {k}")
            elif op == "mor_del":
                table.delete_where(
                    spark, f"k = {k}", strategy="merge_on_read"
                )
            elif op == "pos_del":
                table.delete_where(
                    spark, f"k = {k}",
                    strategy="merge_on_read_position",
                )
            elif op == "upd":
                table.update_where(spark, f"k = {k}", {"k": "k + 10"})
            elif op == "pos_upd":
                table.update_where(
                    spark, f"k = {k}", {"k": "k + 10"},
                    strategy="merge_on_read_position",
                )
            elif op == "compact":
                table.compact(spark)
        log = table.changelog_between(spark)
        ins = log.filter("_change_type = 'insert'").drop(*CDC_COLS)
        dels = log.filter("_change_type = 'delete'").drop(*CDC_COLS)
        replayed = ins.exceptAll(dels)
        target = table.to_df(spark)
        assert replayed.exceptAll(target).count() == 0, f"seed {seed}"
        assert target.exceptAll(replayed).count() == 0, f"seed {seed}"


def test_scd2_apply_equals_full_rebuild(spark, catalog):
    """Incremental SCD2 maintenance: history built from range 1 plus
    scd2_apply of range 2 must equal the from-scratch rebuild over the
    full changelog — frame-for-frame, ordinals included."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        scd2_apply,
        scd2_history,
    )

    table, df = _mk(spark, catalog, "scdi")
    table.append(df.filter("id < 30"))                        # ord 0
    table.update_where(spark, "k = 2", {"k": "k + 100"})      # ord 1
    mid = table.snapshots[-1]
    n_consumed = 2
    table.delete_where(spark, "k = 4", strategy="merge_on_read")  # 2
    table.append(df.filter("id >= 30 AND id < 50"))           # ord 3
    table.update_where(                                        # ord 4
        spark, "k = 6", {"k": "k + 200"},
        strategy="merge_on_read_position",
    )

    hist1 = scd2_history(
        table.changelog_between(spark, to_snapshot=mid.snapshot_id),
        ["id"],
    )
    incremental = scd2_apply(
        hist1,
        table.changelog_between(spark, from_snapshot=mid.snapshot_id),
        ["id"],
        ordinal_offset=n_consumed,
    )
    full = scd2_history(table.changelog_between(spark), ["id"])
    assert incremental.exceptAll(full).count() == 0
    assert full.exceptAll(incremental).count() == 0
    # shape guards
    with pytest.raises(TableFormatError):
        scd2_apply(df, table.changelog_between(spark), ["id"], 0)
    with pytest.raises(TableFormatError):
        scd2_apply(hist1, df, ["id"], 0)
