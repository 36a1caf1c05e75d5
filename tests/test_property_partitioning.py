"""Property-based tests for partition transforms and the hidden-
partitioning predicate rewrite — the soundness argument behind file
pruning (a pruned file must never contain a matching row). Pure
Python: no Spark session needed."""

from __future__ import annotations

import datetime as dt

import hypothesis.strategies as st
from hypothesis import given, settings

from sample_iceberg_schema_evolution_pyiceberg_spark.partitioning import (
    SPEC_FIELD_ID_START,
    PartitionField,
    PartitionSpec,
    compile_partition_spec,
    evolve_spec,
    specs_equal,
)

_TS = st.datetimes(
    min_value=dt.datetime(1970, 1, 1), max_value=dt.datetime(2100, 1, 1)
)
_TRANSFORM = st.sampled_from(["year", "month", "day", "hour"])


def _field(transform: str) -> PartitionField:
    return PartitionField("ts", transform, f"ts_{transform}", 1000)


@settings(max_examples=300, deadline=None)
@given(_TS, _TS, _TRANSFORM)
def test_truncate_is_monotone(a, b, transform):
    """x <= y  =>  trunc(x) <= trunc(y): the property that makes the
    range-predicate rewrite sound (string compare == chronological
    compare for the fixed-width formats)."""
    f = _field(transform)
    ta = f.truncate_literal(a.isoformat(sep=" "))
    tb = f.truncate_literal(b.isoformat(sep=" "))
    if a <= b:
        assert ta <= tb
    else:
        assert ta >= tb


@settings(max_examples=300, deadline=None)
@given(_TS, _TRANSFORM)
def test_truncate_matches_datetime_truncation(ts, transform):
    """The string-width truncation equals real calendar truncation."""
    f = _field(transform)
    got = f.truncate_literal(ts.isoformat(sep=" "))
    expected = {
        "year": ts.strftime("%Y"),
        "month": ts.strftime("%Y-%m"),
        "day": ts.strftime("%Y-%m-%d"),
        "hour": ts.strftime("%Y-%m-%d-%H"),
    }[transform]
    assert got == expected


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["ts", "d", "t2"]), _TRANSFORM),
        max_size=3,
    )
)
def test_compile_assigns_sequential_ids_and_default_names(parts):
    table_def = {
        "partitions": [
            {"column_name": c, "transform": tr} for c, tr in parts
        ]
    }
    spec = compile_partition_spec(table_def)
    assert [f.spec_field_id for f in spec.fields] == [
        SPEC_FIELD_ID_START + i for i in range(len(parts))
    ]
    for (c, tr), f in zip(parts, spec.fields):
        assert f.name == f"{c}_{tr}"
        assert f.partition_column == f"_p_{c}_{tr}"


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.sampled_from(["a", "b"]), _TRANSFORM), max_size=2),
    st.lists(st.tuples(st.sampled_from(["a", "b"]), _TRANSFORM), max_size=2),
)
def test_evolve_spec_fresh_ids_and_idempotence(p1, p2):
    s1 = compile_partition_spec(
        {"partitions": [{"column_name": c, "transform": t} for c, t in p1]}
    )
    s2 = compile_partition_spec(
        {"partitions": [{"column_name": c, "transform": t} for c, t in p2]}
    )
    evolved = evolve_spec(s1, s2)
    if specs_equal(s1, s2):
        assert evolved is s1  # no-op on equal specs (strict detector)
    else:
        assert specs_equal(evolved, s2)
        old_ids = {f.spec_field_id for f in s1.fields}
        assert all(f.spec_field_id not in old_ids for f in evolved.fields)
    # evolving again to the same target is a no-op
    assert evolve_spec(evolved, s2) is evolved
    # round-trip through JSON preserves the spec
    rt = PartitionSpec.from_json(evolved.to_json())
    assert specs_equal(rt, evolved)
    assert [f.spec_field_id for f in rt.fields] == [
        f.spec_field_id for f in evolved.fields
    ]


# ---------------------------------------------------------------------------
# Manifest-pruning bound logic: never-drops-a-matching-row, by property
# ---------------------------------------------------------------------------


import hypothesis.strategies as st  # noqa: E402
from hypothesis import given, settings  # noqa: E402

_OPS = ("=", "==", ">", ">=", "<", "<=")


@settings(max_examples=300, deadline=None)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=12),
    lit=st.integers(-55, 55),
    op=st.sampled_from(_OPS),
)
def test_file_may_match_never_excludes_a_matching_value(vals, lit, op):
    """Soundness by exhaustion: if ANY value in the file satisfies
    ``v op lit``, the bound test must keep the file. (The converse —
    pruning effectiveness — is a quality property, not a correctness
    one, and is covered by the fewer-input-files tests.)"""
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        _file_may_match,
    )

    import operator

    stats = {"c": [min(vals), max(vals)]}
    cmp = {
        "=": operator.eq, "==": operator.eq, ">": operator.gt,
        ">=": operator.ge, "<": operator.lt, "<=": operator.le,
    }[op]
    any_match = any(cmp(v, lit) for v in vals)
    keeps = _file_may_match(stats, "c", op, lit)
    if any_match:
        assert keeps, (vals, op, lit)


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(st.integers(-30, 30), min_size=1, max_size=10),
    lits=st.lists(st.integers(-35, 35), min_size=1, max_size=5),
)
def test_file_may_match_in_list_never_excludes_a_member(vals, lits):
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        _file_may_match,
    )

    stats = {"c": [min(vals), max(vals)]}
    if set(vals) & set(lits):
        assert _file_may_match(stats, "c", "in", lits)
