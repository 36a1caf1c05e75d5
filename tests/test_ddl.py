"""SQL DDL front-end tests: the v1->v2 golden evolution episode
(reference assets orders_v1.json -> orders_v2.json) driven purely by
DDL strings, plus parser edge cases and error contract."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from pyspark.sql import types as T

from sample_iceberg_schema_evolution_pyiceberg_spark.ddl import DdlFrontend
from sample_iceberg_schema_evolution_pyiceberg_spark.schema_compiler import compile_schema
from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import LakeCatalog

ASSETS = Path(__file__).parent.parent / (
    "sample_iceberg_schema_evolution_pyiceberg_spark/assets"
)


@pytest.fixture()
def ddl(spark, tmp_path):
    return DdlFrontend(spark, LakeCatalog(tmp_path / "wh"))


def _norm(dt: T.DataType) -> T.DataType:
    """Nullability-normalized copy (DDL strings can't express every
    containsNull/valueContainsNull combination the config compiler
    emits; the episode's observable contract is names/types/order)."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _norm(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_norm(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_norm(dt.keyType), _norm(dt.valueType), True)
    return dt


# single source of truth for the golden episode statements — the
# driver-gate query (a09) runs the same list
from sample_iceberg_schema_evolution_pyiceberg_spark.operators.ddl_queries import (  # noqa: E402
    GOLDEN_ALTER_V2 as ALTER_V2,
    GOLDEN_CREATE_V1 as CREATE_V1,
)


def test_golden_episode_via_sql(ddl):
    r = ddl.sql(CREATE_V1)
    assert not r.has_error, r.message_list
    assert r.change_type == "CREATE TABLE"

    for stmt in ALTER_V2:
        r = ddl.sql(stmt)
        assert not r.has_error, (stmt, r.message_list)
        assert r.change_type == "ALTER TABLE"

    table = ddl.catalog.load_table("customer_order", "orders")
    v2 = json.loads((ASSETS / "orders_v2.json").read_text())
    assert _norm(table.schema) == _norm(compile_schema(v2))
    spec = table.partition_spec
    assert [(f.source_column, f.transform) for f in spec.fields] == [
        ("order_time", "month")
    ]
    # metadata-only evolution: every schema version retained
    assert table.schema_at(1) is not None


def test_create_if_not_exists_and_drop(ddl):
    assert not ddl.sql("CREATE TABLE d.t (a INT)").has_error
    r = ddl.sql("CREATE TABLE d.t (a INT)")
    assert r.has_error  # no IF NOT EXISTS -> error accumulated, not raised
    r = ddl.sql("CREATE TABLE IF NOT EXISTS d.t (a INT)")
    assert not r.has_error
    assert not ddl.sql("DROP TABLE d.t").has_error
    assert ddl.sql("DROP TABLE d.t").has_error
    assert not ddl.sql("DROP TABLE IF EXISTS d.t").has_error


def test_add_columns_multi_and_type_update(ddl):
    ddl.sql("CREATE TABLE d.t (a INT, b FLOAT)")
    r = ddl.sql("ALTER TABLE d.t ADD COLUMNS (c STRING, d DECIMAL(10,2))")
    assert not r.has_error
    r = ddl.sql("ALTER TABLE d.t ALTER COLUMN a TYPE BIGINT")
    assert not r.has_error
    schema = ddl.catalog.load_table("d", "t").schema
    assert schema.simpleString() == (
        "struct<a:bigint,b:float,c:string,d:decimal(10,2)>"
    )
    # illegal promotion -> error accumulated, schema untouched
    r = ddl.sql("ALTER TABLE d.t ALTER COLUMN b TYPE INT")
    assert r.has_error
    assert "not allowed" in " ".join(r.message_list)
    assert ddl.catalog.load_table("d", "t").schema == schema


def test_partition_field_errors_and_tblproperties(ddl):
    r = ddl.sql(
        "CREATE TABLE d.p (ts TIMESTAMP_NTZ, v INT) "
        "PARTITIONED BY (days(ts)) "
        "TBLPROPERTIES ('write.target-size' = '512m')"
    )
    assert not r.has_error, r.message_list
    t = ddl.catalog.load_table("d", "p")
    assert t.properties.get("write.target-size") == "512m"
    assert [(f.source_column, f.transform) for f in t.partition_spec.fields] == [
        ("ts", "day")
    ]
    # bucket(16, v) is a supported transform (r9): lands as bucket[16]
    r2 = ddl.sql("ALTER TABLE d.p ADD PARTITION FIELD bucket(16, v)")
    assert not r2.has_error, r2.message_list
    t = ddl.catalog.load_table("d", "p")
    assert ("v", "bucket[16]") in [
        (f.source_column, f.transform) for f in t.partition_spec.fields
    ]
    # a genuinely unknown transform still errors
    assert ddl.sql(
        "ALTER TABLE d.p ADD PARTITION FIELD zorder(16, v)"
    ).has_error
    assert ddl.sql("CREATE TABLE d.q (a INT) PARTITIONED BY (days(b))").has_error


def test_unparseable_statement_is_error_not_raise(ddl):
    r = ddl.sql("GRANT ALL ON d.t TO role")
    assert r.has_error and "unrecognized" in r.message_list[0]


def test_data_plane_insert_select_ctas(ddl):
    assert not ddl.sql(
        "CREATE TABLE shop.sales (sale_id BIGINT, region STRING, amount DOUBLE)"
    ).has_error
    r = ddl.sql(
        "INSERT INTO shop.sales VALUES "
        "(1, 'east', 10.5), (2, 'west', 20.0), (3, 'east', 4.5)"
    )
    assert not r.has_error and r.change_type == "INSERT"

    df = ddl.query(
        "SELECT region, SUM(amount) AS total FROM shop.sales "
        "GROUP BY region ORDER BY region"
    )
    assert [(r["region"], r["total"]) for r in df.collect()] == [
        ("east", 15.0),
        ("west", 20.0),
    ]

    # CTAS from a lake-table query
    r = ddl.sql(
        "CREATE TABLE shop.region_totals AS "
        "SELECT region, SUM(amount) AS total FROM shop.sales GROUP BY region"
    )
    assert not r.has_error, r.message_list
    got = ddl.query("SELECT * FROM shop.region_totals ORDER BY region")
    assert [(r["region"], r["total"]) for r in got.collect()] == [
        ("east", 15.0),
        ("west", 20.0),
    ]

    # INSERT OVERWRITE replaces the live set
    r = ddl.sql("INSERT OVERWRITE shop.sales VALUES (9, 'north', 1.0)")
    assert not r.has_error
    assert ddl.query("SELECT COUNT(*) AS n FROM shop.sales").collect()[0]["n"] == 1

    # positional INSERT casts through the write path's alignment
    r = ddl.sql("INSERT INTO shop.sales SELECT 10, 'south', 2")  # int -> double
    assert not r.has_error, r.message_list
    assert ddl.query(
        "SELECT SUM(amount) AS s FROM shop.sales"
    ).collect()[0]["s"] == 3.0

    # arity mismatch -> accumulated error, no partial write
    r = ddl.sql("INSERT INTO shop.sales VALUES (1, 'x')")
    assert r.has_error
    assert ddl.query("SELECT COUNT(*) AS n FROM shop.sales").collect()[0]["n"] == 2


def test_query_on_sql_is_guided(ddl):
    r = ddl.sql("SELECT 1")
    assert r.has_error and "query()" in r.message_list[0]


def test_sql_time_travel_version_as_of(ddl):
    ddl.sql("CREATE TABLE tt.t (v BIGINT)")
    ddl.sql("INSERT INTO tt.t VALUES (1)")
    table = ddl.catalog.load_table("tt", "t")
    snap1 = table.snapshots[-1].snapshot_id
    ddl.sql("INSERT INTO tt.t VALUES (2)")

    now = ddl.query("SELECT COUNT(*) AS n FROM tt.t").collect()[0]["n"]
    then = ddl.query(
        f"SELECT COUNT(*) AS n FROM tt.t VERSION AS OF '{snap1}'"
    ).collect()[0]["n"]
    assert (now, then) == (2, 1)
    # both bindings usable in one statement
    both = ddl.query(
        f"SELECT (SELECT COUNT(*) FROM tt.t) - "
        f"(SELECT COUNT(*) FROM tt.t VERSION AS OF '{snap1}') AS d"
    ).collect()[0]["d"]
    assert both == 1


def test_dml_delete_update_merge(ddl):
    ddl.sql("CREATE TABLE dml.t (k BIGINT, status STRING, amount DOUBLE)")
    ddl.sql(
        "INSERT INTO dml.t VALUES "
        "(1, 'open', 10.0), (2, 'open', 20.0), (3, 'closed', 30.0)"
    )

    r = ddl.sql("DELETE FROM dml.t WHERE k = 3")
    assert not r.has_error and r.change_type == "DELETE"
    assert ddl.query("SELECT COUNT(*) AS n FROM dml.t").collect()[0]["n"] == 2

    r = ddl.sql("UPDATE dml.t SET amount = amount * 2, status = 'bumped' WHERE k = 2")
    assert not r.has_error and r.change_type == "UPDATE"
    rows = {
        r["k"]: (r["status"], r["amount"])
        for r in ddl.query("SELECT * FROM dml.t").collect()
    }
    assert rows == {1: ("open", 10.0), 2: ("bumped", 40.0)}

    # MERGE: update matched from source (s_ prefix), insert unmatched
    r = ddl.sql(
        "MERGE INTO dml.t USING "
        "(SELECT * FROM VALUES (2, 'merged', 5.0), (9, 'new', 9.0) "
        " AS s(k, status, amount)) "
        "ON (k) "
        "WHEN MATCHED THEN UPDATE SET status = s_status, amount = s_amount "
        "WHEN NOT MATCHED THEN INSERT"
    )
    assert not r.has_error, r.message_list
    assert r.change_type == "MERGE"
    rows = {
        r["k"]: (r["status"], r["amount"])
        for r in ddl.query("SELECT * FROM dml.t").collect()
    }
    assert rows == {
        1: ("open", 10.0),
        2: ("merged", 5.0),
        9: ("new", 9.0),
    }

    # MERGE delete clause
    r = ddl.sql(
        "MERGE INTO dml.t USING (SELECT 9 AS k) ON (k) "
        "WHEN MATCHED THEN DELETE"
    )
    assert not r.has_error, r.message_list
    assert sorted(
        r["k"] for r in ddl.query("SELECT k FROM dml.t").collect()
    ) == [1, 2]

    # errors accumulate, never raise
    assert ddl.sql("DELETE FROM dml.missing WHERE k = 1").has_error
    assert ddl.sql(
        "MERGE INTO dml.t USING (SELECT 1 AS k) ON (k) WHEN SOMETHING"
    ).has_error


def test_show_tables_and_describe(ddl):
    assert ddl.query("SHOW TABLES").count() == 0
    ddl.sql("CREATE TABLE m.a (x INT)")
    ddl.sql(
        "CREATE TABLE m.b (k BIGINT, ts TIMESTAMP_NTZ) "
        "PARTITIONED BY (months(ts))"
    )
    tables = {(r["database"], r["table"]) for r in ddl.query("SHOW TABLES").collect()}
    assert tables == {("m", "a"), ("m", "b")}
    desc = ddl.query("DESCRIBE m.b").collect()
    assert [(r["col_name"], r["data_type"]) for r in desc] == [
        ("k", "bigint"),
        ("ts", "timestamp_ntz"),
        ("# partition: ts_month", "month(ts)"),
    ]


def test_drop_partition_field_by_name(ddl):
    ddl.sql(
        "CREATE TABLE pf.t (k BIGINT, ts TIMESTAMP_NTZ) "
        "PARTITIONED BY (days(ts))"
    )
    r = ddl.sql("ALTER TABLE pf.t DROP PARTITION FIELD ts_day")  # by NAME
    assert not r.has_error, r.message_list
    assert ddl.catalog.load_table("pf", "t").partition_spec.fields == ()


def test_add_partition_field_validates_source(ddl):
    ddl.sql("CREATE TABLE pf.v (k BIGINT, ts TIMESTAMP_NTZ)")
    r = ddl.sql("ALTER TABLE pf.v ADD PARTITION FIELD days(typo_col)")
    assert r.has_error  # bad source rejected, spec NOT committed
    assert ddl.catalog.load_table("pf", "v").partition_spec.fields == ()
    # table remains writable
    assert not ddl.sql("INSERT INTO pf.v VALUES (1, TIMESTAMP '2024-01-01')").has_error


def test_bind_tables_ignores_string_literals(ddl):
    ddl.sql("CREATE TABLE lit.t (k BIGINT, note STRING)")
    ddl.sql("INSERT INTO lit.t VALUES (1, 'moved to lit.t yesterday')")
    rows = ddl.query(
        "SELECT k FROM lit.t WHERE note = 'moved to lit.t yesterday'"
    ).collect()
    assert [r["k"] for r in rows] == [1]


def test_update_simultaneous_assignment_swaps(ddl):
    ddl.sql("CREATE TABLE sw.t (a BIGINT, b BIGINT)")
    ddl.sql("INSERT INTO sw.t VALUES (1, 2)")
    r = ddl.sql("UPDATE sw.t SET a = b, b = a")
    assert not r.has_error, r.message_list
    row = ddl.query("SELECT * FROM sw.t").collect()[0]
    assert (row["a"], row["b"]) == (2, 1)  # swapped, not both old-b


def test_set_unset_tblproperties(ddl):
    ddl.sql("CREATE TABLE pr.t (k BIGINT) TBLPROPERTIES ('owner' = 'me')")
    r = ddl.sql(
        "ALTER TABLE pr.t SET TBLPROPERTIES "
        "('retention' = '30d', 'owner' = 'you')"
    )
    assert not r.has_error, r.message_list
    t = ddl.catalog.load_table("pr", "t")
    assert t.properties == {"owner": "you", "retention": "30d"}
    assert not ddl.sql(
        "ALTER TABLE pr.t UNSET TBLPROPERTIES ('owner')"
    ).has_error
    assert ddl.catalog.load_table("pr", "t").properties == {
        "retention": "30d"
    }


def test_update_where_inside_literal(ddl):
    ddl.sql("CREATE TABLE ql.t (k BIGINT, note STRING)")
    ddl.sql("INSERT INTO ql.t VALUES (1, 'x'), (2, 'y')")
    r = ddl.sql("UPDATE ql.t SET note = 'where it was' WHERE k = 1")
    assert not r.has_error, r.message_list
    rows = {r["k"]: r["note"] for r in ddl.query("SELECT * FROM ql.t").collect()}
    assert rows == {1: "where it was", 2: "y"}
    # no WHERE at all -> updates every row
    assert not ddl.sql("UPDATE ql.t SET note = 'all'").has_error
    assert {r["note"] for r in ddl.query("SELECT note FROM ql.t").collect()} == {"all"}


def test_update_unknown_column_errors(ddl):
    ddl.sql("CREATE TABLE uk.t (k BIGINT)")
    ddl.sql("INSERT INTO uk.t VALUES (1)")
    r = ddl.sql("UPDATE uk.t SET nope = 5 WHERE k = 1")
    assert r.has_error and "nope" in " ".join(r.message_list)
    # no snapshot was committed for the bad statement
    assert len(ddl.catalog.load_table("uk", "t").snapshots) == 1


def test_set_expression_with_comparison_operator(ddl):
    ddl.sql("CREATE TABLE cmp.t (price DOUBLE, flag BOOLEAN, touched BIGINT)")
    ddl.sql("INSERT INTO cmp.t VALUES (150.0, false, 0), (50.0, false, 0)")
    r = ddl.sql("UPDATE cmp.t SET flag = price > 100, touched = 1")
    assert not r.has_error, r.message_list
    rows = sorted(
        (r["price"], r["flag"], r["touched"])
        for r in ddl.query("SELECT * FROM cmp.t").collect()
    )
    assert rows == [(50.0, False, 1), (150.0, True, 1)]


def test_drop_or_retype_missing_column_errors(ddl):
    ddl.sql("CREATE TABLE mc.t (customer_name STRING)")
    r = ddl.sql("ALTER TABLE mc.t DROP COLUMN cusomer_name")  # typo
    assert r.has_error and "not found" in r.message_list[0]
    r = ddl.sql("ALTER TABLE mc.t ALTER COLUMN cusomer_name TYPE INT")
    assert r.has_error and "not found" in r.message_list[0]


def test_double_quoted_literals_protected(ddl):
    ddl.sql("CREATE TABLE dq.t (k BIGINT, note STRING)")
    ddl.sql('INSERT INTO dq.t VALUES (1, "see where dq.t lives")')
    r = ddl.sql('UPDATE dq.t SET note = "where clause" WHERE k = 1')
    assert not r.has_error, r.message_list
    rows = ddl.query(
        'SELECT k FROM dq.t WHERE note = "where clause"'
    ).collect()
    assert [r["k"] for r in rows] == [1]


def test_insert_select_and_merge_across_lake_tables(ddl):
    """INSERT and MERGE bodies routed through query() can reference
    other lake tables (identifier binding inside DML sources)."""
    ddl.sql("CREATE TABLE x.src (k BIGINT, v DOUBLE)")
    ddl.sql("INSERT INTO x.src VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    ddl.sql("CREATE TABLE x.dst (k BIGINT, v DOUBLE)")

    r = ddl.sql("INSERT INTO x.dst SELECT k, v FROM x.src WHERE k <= 2")
    assert not r.has_error, r.message_list
    assert ddl.query("SELECT COUNT(*) AS n FROM x.dst").collect()[0]["n"] == 2

    r = ddl.sql(
        "MERGE INTO x.dst USING (SELECT k, v * 10 AS v FROM x.src) ON (k) "
        "WHEN MATCHED THEN UPDATE SET v = s_v "
        "WHEN NOT MATCHED THEN INSERT"
    )
    assert not r.has_error, r.message_list
    rows = {r["k"]: r["v"] for r in ddl.query("SELECT * FROM x.dst").collect()}
    assert rows == {1: 15.0, 2: 25.0, 3: 35.0}


def test_merge_clause_keyword_inside_literal(ddl):
    ddl.sql("CREATE TABLE mk.t (k BIGINT, note STRING)")
    ddl.sql("INSERT INTO mk.t VALUES (1, 'old')")
    # the literal contains a clause keyword; no INSERT clause is given,
    # so the unmatched source row (k=2) must NOT be inserted
    r = ddl.sql(
        "MERGE INTO mk.t USING (SELECT * FROM VALUES (1), (2) AS s(k)) "
        "ON (k) WHEN MATCHED THEN UPDATE SET "
        "note = 'WHEN NOT MATCHED THEN INSERT'"
    )
    assert not r.has_error, r.message_list
    rows = {r["k"]: r["note"] for r in ddl.query("SELECT * FROM mk.t").collect()}
    assert rows == {1: "WHEN NOT MATCHED THEN INSERT"}


def test_split_where_paren_depth():
    from sample_iceberg_schema_evolution_pyiceberg_spark.ddl import _split_where

    # WHERE inside a parenthesized subquery must not split the body
    head, cond = _split_where(
        "x = (SELECT MAX(y) FROM t WHERE z = 1) WHERE id = 2"
    )
    assert head == "x = (SELECT MAX(y) FROM t WHERE z = 1)"
    assert cond == "id = 2"
    # WHERE inside a literal still protected
    head, cond = _split_where("note = 'where x' WHERE k = 3")
    assert head == "note = 'where x'"
    assert cond == "k = 3"
    # no WHERE at all
    head, cond = _split_where("a = 1, b = 2")
    assert head == "a = 1, b = 2"
    assert cond is None


def test_merge_conditional_matched_clauses(ddl):
    ddl.sql("CREATE TABLE mc.t (k BIGINT, v DOUBLE, status STRING)")
    ddl.sql(
        "INSERT INTO mc.t VALUES (1, 5.0, 'ok'), (2, 50.0, 'ok'), "
        "(3, 500.0, 'ok')"
    )
    # first-match-wins: big rows deleted, mid rows flagged, small rows
    # updated by the terminal unconditional clause
    r = ddl.sql(
        "MERGE INTO mc.t USING (SELECT * FROM VALUES (1), (2), (3), (4) "
        "AS s(k)) ON (k) "
        "WHEN MATCHED AND v >= 100 THEN DELETE "
        "WHEN MATCHED AND v >= 10 THEN UPDATE SET status = 'flagged' "
        "WHEN MATCHED THEN UPDATE SET v = v * 2 "
        "WHEN NOT MATCHED THEN INSERT"
    )
    assert not r.has_error, r.message_list
    rows = {
        r["k"]: (r["v"], r["status"])
        for r in ddl.query("SELECT * FROM mc.t").collect()
    }
    assert rows == {
        1: (10.0, "ok"),        # v*2
        2: (50.0, "flagged"),   # flag only
        4: (None, None),        # inserted, no source cols beyond k
    }
    assert 3 not in rows        # deleted


def test_merge_insert_column_list(ddl):
    ddl.sql("CREATE TABLE mi.t (k BIGINT, v DOUBLE, note STRING)")
    ddl.sql("INSERT INTO mi.t VALUES (1, 1.0, 'old')")
    r = ddl.sql(
        "MERGE INTO mi.t USING (SELECT * FROM VALUES (1, 10.0), (2, 20.0) "
        "AS s(k, amount)) ON (k) "
        "WHEN MATCHED THEN UPDATE SET v = s_amount "
        "WHEN NOT MATCHED AND amount > 15 THEN INSERT (k, v, note) "
        "VALUES (k, amount / 2, 'from merge')"
    )
    assert not r.has_error, r.message_list
    rows = {
        r["k"]: (r["v"], r["note"])
        for r in ddl.query("SELECT * FROM mi.t").collect()
    }
    assert rows == {1: (10.0, "old"), 2: (10.0, "from merge")}


def test_merge_insert_condition_filters(ddl):
    ddl.sql("CREATE TABLE mf.t (k BIGINT, v DOUBLE)")
    r = ddl.sql(
        "MERGE INTO mf.t USING (SELECT * FROM VALUES (1, 1.0), (2, 99.0) "
        "AS s(k, v)) ON (k) "
        "WHEN NOT MATCHED AND v < 10 THEN INSERT"
    )
    assert not r.has_error, r.message_list
    rows = [r["k"] for r in ddl.query("SELECT * FROM mf.t").collect()]
    assert rows == [1]


def test_merge_rejects_unreachable_clause(ddl):
    ddl.sql("CREATE TABLE mu.t (k BIGINT, v DOUBLE)")
    r = ddl.sql(
        "MERGE INTO mu.t USING (SELECT * FROM VALUES (1, 1.0) AS s(k, v)) "
        "ON (k) "
        "WHEN MATCHED THEN DELETE "
        "WHEN MATCHED AND v > 5 THEN UPDATE SET v = 0"
    )
    assert r.has_error
    assert any("unreachable" in m for m in r.message_list)


def test_call_maintenance_procedures(ddl):
    r = ddl.sql("CREATE TABLE db.m (id BIGINT, v STRING)")
    assert not r.has_error
    for i in range(3):
        assert not ddl.sql(
            f"INSERT INTO db.m VALUES ({i}, 'x{i}')"
        ).has_error
    tbl = ddl.catalog.load_table("db", "m")
    assert len(tbl.snapshots) == 3
    # rewrite_data_files = compaction; history keeps the old snapshots
    r = ddl.sql("CALL system.rewrite_data_files('db.m')")
    assert not r.has_error and "compacted" in r.message_list[-1]
    tbl = ddl.catalog.load_table("db", "m")
    assert len(tbl.snapshots) == 1
    assert len(tbl.meta["snapshot_history"]) == 3
    # expire everything: history gone, current read intact
    r = ddl.sql("CALL system.expire_snapshots('db.m', retain_last => 1)")
    assert not r.has_error and "expired 2" in r.message_list[-1]
    # quoted digits coerce cleanly (semantic, not syntactic, typing)
    r = ddl.sql(
        f"CALL system.expire_snapshots('db.m', older_than_ms => '{2**62}')"
    )
    assert not r.has_error and "expired 1" in r.message_list[-1]
    assert ddl.query("SELECT COUNT(*) AS n FROM db.m").collect()[0].n == 3
    r = ddl.sql("CALL system.remove_orphan_files('db.m')")
    assert not r.has_error and "removed 0" in r.message_list[-1]


def test_call_error_contract(ddl):
    ddl.sql("CREATE TABLE db.e (id BIGINT)")
    r = ddl.sql("CALL system.nope('db.e')")
    assert r.has_error and "unknown procedure" in r.message_list[-1]
    r = ddl.sql("CALL system.expire_snapshots('db.e', frobnicate => 1)")
    assert r.has_error and "does not accept" in r.message_list[-1]
    r = ddl.sql("CALL system.expire_snapshots(retain_last => 1)")
    assert r.has_error and "positional" in r.message_list[-1]
    r = ddl.sql("CALL system.expire_snapshots('db.missing')")
    assert r.has_error and "does not exist" in r.message_list[-1]
    # bare call = no retention policy -> loud refusal, not total wipe
    r = ddl.sql("CALL system.expire_snapshots('db.e')")
    assert r.has_error and "retention policy" in r.message_list[-1]
    # non-integer value for an int argument names the argument
    r = ddl.sql("CALL system.expire_snapshots('db.e', retain_last => 'x')")
    assert r.has_error and "retain_last" in r.message_list[-1]


def test_sql_changes_cdc_read(ddl):
    ddl.sql("CREATE TABLE db.c (id BIGINT, v STRING)")
    for i in range(3):
        ddl.sql(f"INSERT INTO db.c VALUES ({i}, 'x{i}')")
    tbl = ddl.catalog.load_table("db", "c")
    s1, s2, s3 = [s.snapshot_id for s in tbl.snapshots]
    # (s1, s3] = rows 1 and 2, with CDC metadata columns
    rows = ddl.query(
        f"SELECT id, _snapshot_id, _change_type FROM db.c "
        f"CHANGES BETWEEN '{s1}' AND '{s3}' ORDER BY id"
    ).collect()
    assert [r.id for r in rows] == [1, 2]
    assert [r._snapshot_id for r in rows] == [s2, s3]
    assert {r._change_type for r in rows} == {"insert"}
    # SINCE = to current head; aggregates compose as plain SQL
    n = ddl.query(
        f"SELECT COUNT(*) AS n FROM db.c CHANGES SINCE '{s1}'"
    ).collect()[0].n
    assert n == 2
    # plain reads are unaffected by the CHANGES grammar
    assert ddl.query("SELECT COUNT(*) AS n FROM db.c").collect()[0].n == 3


def test_changes_and_version_syntax_inside_literals_ignored(ddl):
    """Literal text that merely MENTIONS the CHANGES / VERSION AS OF
    syntax must not trigger the side-effecting rewrites."""
    ddl.sql("CREATE TABLE db.lit (id BIGINT, v STRING)")
    ddl.sql("INSERT INTO db.lit VALUES (1, 'db.lit CHANGES SINCE ''zzz''')")
    rows = ddl.query(
        "SELECT id FROM db.lit WHERE v = 'db.lit CHANGES SINCE ''zzz'''"
    ).collect()
    assert [r.id for r in rows] == [1]
    rows = ddl.query(
        "SELECT id FROM db.lit "
        "WHERE v <> 'db.lit VERSION AS OF ''nope'' docs'"
    ).collect()
    assert [r.id for r in rows] == [1]


def test_metadata_tables_sql(ddl):
    ddl.sql("CREATE TABLE db.mt (id BIGINT, v STRING)")
    for i in range(2):
        ddl.sql(f"INSERT INTO db.mt VALUES ({i}, 'x{i}')")
    snaps = ddl.query(
        "SELECT snapshot_id, operation, is_live, expired "
        "FROM db.mt.snapshots ORDER BY sequence_number"
    ).collect()
    assert [s.operation for s in snaps] == ["append", "append"]
    assert all(s.is_live and not s.expired for s in snaps)
    files = ddl.query(
        "SELECT SUM(record_count) AS rc, COUNT(*) AS nf, "
        "SUM(size_bytes) AS sb FROM db.mt.files"
    ).collect()[0]
    assert files.rc == 2 and files.nf >= 1 and files.sb > 0
    # metadata tables compose with data reads in one statement
    joined = ddl.query(
        "SELECT (SELECT COUNT(*) FROM db.mt) AS rows, "
        "(SELECT SUM(record_count) FROM db.mt.files) AS meta_rows"
    ).collect()[0]
    assert joined.rows == joined.meta_rows == 2
    # compaction flips liveness: history appends + one live replace
    # (Iceberg's content-preserving rewrite summary)
    ddl.sql("CALL system.rewrite_data_files('db.mt')")
    ops = {
        (r.operation, r.is_live)
        for r in ddl.query(
            "SELECT operation, is_live FROM db.mt.snapshots"
        ).collect()
    }
    assert ops == {("append", False), ("replace", True)}


def test_call_rollback_to_snapshot(ddl):
    ddl.sql("CREATE TABLE db.rb (id BIGINT)")
    for i in range(3):
        ddl.sql(f"INSERT INTO db.rb VALUES ({i})")
    sid = ddl.catalog.load_table("db", "rb").snapshots[1].snapshot_id
    r = ddl.sql(
        f"CALL system.rollback_to_snapshot('db.rb', snapshot_id => '{sid}')"
    )
    assert not r.has_error and "restored" in r.message_list[-1]
    assert ddl.query("SELECT COUNT(*) AS n FROM db.rb").collect()[0].n == 2
    r = ddl.sql("CALL system.rollback_to_snapshot('db.rb')")
    assert r.has_error and "requires snapshot_id" in r.message_list[-1]


def test_sql_timestamp_as_of(ddl):
    import datetime as dt

    ddl.sql("CREATE TABLE db.ts (id BIGINT)")
    ddl.sql("INSERT INTO db.ts VALUES (1)")
    tbl = ddl.catalog.load_table("db", "ts")
    t1 = tbl.snapshots[0].timestamp_ms
    ddl.sql("INSERT INTO db.ts VALUES (2)")
    # epoch-ms literal
    n = ddl.query(
        f"SELECT COUNT(*) AS n FROM db.ts TIMESTAMP AS OF '{t1}'"
    ).collect()[0].n
    assert n == 1
    # ISO literal resolving after both commits
    iso = dt.datetime.fromtimestamp(
        (t1 + 60_000) / 1000, tz=dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    n = ddl.query(
        f"SELECT COUNT(*) AS n FROM db.ts TIMESTAMP AS OF '{iso}'"
    ).collect()[0].n
    assert n == 2


def test_delete_mode_table_property(ddl):
    """write.delete.mode = merge-on-read routes SQL DELETE to the
    predicate-snapshot path (Iceberg's table-property contract)."""
    ddl.sql("CREATE TABLE db.md (id BIGINT, g BIGINT)")
    for i in range(8):
        ddl.sql(f"INSERT INTO db.md VALUES ({i}, {i % 4})")
    ddl.sql("ALTER TABLE db.md SET TBLPROPERTIES "
            "('write.delete.mode' = 'merge-on-read')")
    r = ddl.sql("DELETE FROM db.md WHERE g = 0")
    assert not r.has_error and "merge_on_read" in r.message_list[-1]
    tbl = ddl.catalog.load_table("db", "md")
    assert any(
        s.delete_predicate == "coalesce((g = 0), false)"
        for s in tbl.snapshots
    )
    assert ddl.query("SELECT COUNT(*) AS n FROM db.md").collect()[0].n == 6
    # compaction folds it; default mode is copy-on-write
    ddl.sql("CALL system.rewrite_data_files('db.md')")
    tbl = ddl.catalog.load_table("db", "md")
    assert all(s.delete_predicate is None for s in tbl.snapshots)
    assert ddl.query("SELECT COUNT(*) AS n FROM db.md").collect()[0].n == 6


def test_timestamp_as_of_two_instants_one_query(ddl):
    """Two ISO literals differing only in seconds must bind distinct
    views (regression: 16-char-truncated view names collided)."""
    import datetime as dt

    ddl.sql("CREATE TABLE db.t2 (id BIGINT)")
    ddl.sql("INSERT INTO db.t2 VALUES (1)")
    t1 = ddl.catalog.load_table("db", "t2").snapshots[0].timestamp_ms
    import time as _t; _t.sleep(1.1)
    ddl.sql("INSERT INTO db.t2 VALUES (2)")
    t2 = ddl.catalog.load_table("db", "t2").snapshots[1].timestamp_ms

    def iso(ms):
        return dt.datetime.fromtimestamp(
            ms / 1000, tz=dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")

    # +1000ms: strftime truncates to the second, which must still land
    # at-or-after t1 and strictly before t2 (the 1.1s sleep guarantees)
    row = ddl.query(
        f"SELECT (SELECT COUNT(*) FROM db.t2 TIMESTAMP AS OF "
        f"'{iso(t1 + 1000)}') AS a, (SELECT COUNT(*) FROM db.t2 "
        f"TIMESTAMP AS OF '{iso(t2 + 1000)}') AS b"
    ).collect()[0]
    assert (row.a, row.b) == (1, 2)
    # explicit timezone offsets are honored, not reinterpreted as UTC
    plus2 = dt.datetime.fromtimestamp(
        (t2 + 1000) / 1000, tz=dt.timezone(dt.timedelta(hours=2))
    ).strftime("%Y-%m-%dT%H:%M:%S+02:00")
    n = ddl.query(
        f"SELECT COUNT(*) AS n FROM db.t2 TIMESTAMP AS OF '{plus2}'"
    ).collect()[0].n
    assert n == 2
    # malformed literals surface as DdlError text, not raw ValueError
    try:
        ddl.query("SELECT * FROM db.t2 TIMESTAMP AS OF 'not-a-date'")
        raise AssertionError("expected DdlError")
    except Exception as e:
        assert "TIMESTAMP AS OF" in str(e)


def test_unknown_delete_mode_errors(ddl):
    ddl.sql("CREATE TABLE db.dm (id BIGINT)")
    ddl.sql("INSERT INTO db.dm VALUES (1)")
    ddl.sql("ALTER TABLE db.dm SET TBLPROPERTIES "
            "('write.delete.mode' = 'merge_on_read')")  # underscore typo
    r = ddl.sql("DELETE FROM db.dm WHERE id = 1")
    assert r.has_error and "write.delete.mode" in r.message_list[-1]


def test_update_mode_table_property(ddl):
    ddl.sql("CREATE TABLE db.um (id BIGINT, v STRING)")
    for i in range(6):
        ddl.sql(f"INSERT INTO db.um VALUES ({i}, 'x')")
    ddl.sql("ALTER TABLE db.um SET TBLPROPERTIES "
            "('write.update.mode' = 'merge-on-read')")
    r = ddl.sql("UPDATE db.um SET v = 'y' WHERE id < 2")
    assert not r.has_error, r.message_list
    tbl = ddl.catalog.load_table("db", "um")
    assert any(
        s.delete_predicate == "coalesce((id < 2), false)"
        for s in tbl.snapshots
    )
    got = {
        (r.id, r.v)
        for r in ddl.query("SELECT id, v FROM db.um").collect()
    }
    assert got == {(0, "y"), (1, "y")} | {(i, "x") for i in range(2, 6)}


def test_call_rewrite_with_sort_and_target_files(spark, ddl):
    """CALL system.rewrite_data_files with sort_by + target_files:
    the rewrite range-clusters into exactly N files whose manifest
    bounds then drive scan-time file skips."""
    assert not ddl.sql("CREATE TABLE db.rw (id BIGINT, v STRING)").has_error
    for lo in (0, 100, 200):
        assert not ddl.sql(
            "INSERT INTO db.rw SELECT id, CAST(id AS STRING) "
            f"FROM range({lo}, {lo + 100})"
        ).has_error
    r = ddl.sql(
        "CALL system.rewrite_data_files('db.rw', sort_by => 'id', "
        "target_files => 6)"
    )
    assert not r.has_error, r.message_list
    tbl = ddl.catalog.load_table("db", "rw")
    assert len(tbl.snapshots) == 1
    assert len(tbl.snapshots[0].files) == 6
    pruned = tbl.to_df(spark, pruning=[("id", ">=", 290)])
    assert sorted(x.id for x in pruned.collect()) == list(range(290, 300))
    assert len(pruned.inputFiles()) < 6
    # bad type still fails semantically, naming the argument
    r = ddl.sql(
        "CALL system.rewrite_data_files('db.rw', target_files => 'x')"
    )
    assert r.has_error and "target_files" in " ".join(r.message_list)


def test_call_expire_metadata_versions(ddl):
    assert not ddl.sql("CREATE TABLE db.mv (id BIGINT)").has_error
    for i in range(4):
        assert not ddl.sql(
            f"ALTER TABLE db.mv ADD COLUMN c{i} DOUBLE"
        ).has_error
    r = ddl.sql(
        "CALL system.expire_metadata_versions('db.mv', keep_last => 2)"
    )
    assert not r.has_error and "deleted 3 metadata file(s)" in r.message_list[-1]
    tbl = ddl.catalog.load_table("db", "mv")
    assert tbl.schema.fieldNames() == ["id", "c0", "c1", "c2", "c3"]


def test_tag_ddl_and_refs_table(spark, ddl):
    """CREATE TAG / DROP TAG through SQL; VERSION AS OF resolves tag
    names; db.tbl.refs lists them."""
    assert not ddl.sql("CREATE TABLE db.tg (id BIGINT)").has_error
    assert not ddl.sql("INSERT INTO db.tg SELECT id FROM range(0, 30)").has_error
    r = ddl.sql("ALTER TABLE db.tg CREATE TAG checkpoint")
    assert not r.has_error and "Created tag" in r.message_list[-1]
    assert not ddl.sql(
        "INSERT INTO db.tg SELECT id FROM range(30, 50)"
    ).has_error
    got = ddl.query(
        "SELECT COUNT(*) AS n FROM db.tg VERSION AS OF 'checkpoint'"
    ).collect()
    assert got[0].n == 30
    assert ddl.query("SELECT COUNT(*) AS n FROM db.tg").collect()[0].n == 50
    refs = ddl.query(
        "SELECT name, type FROM db.tg.refs ORDER BY name"
    ).collect()
    assert [(r2.name, r2.type) for r2 in refs] == [("checkpoint", "tag")]
    r = ddl.sql("ALTER TABLE db.tg DROP TAG checkpoint")
    assert not r.has_error
    assert ddl.query("SELECT COUNT(*) AS n FROM db.tg.refs").collect()[0].n == 0


def test_branch_ddl_and_fast_forward(spark, ddl):
    """CREATE BRANCH / DROP BRANCH / CALL system.fast_forward through
    SQL, including the divergence refusal."""
    assert not ddl.sql("CREATE TABLE db.br (id BIGINT)").has_error
    assert not ddl.sql("INSERT INTO db.br SELECT id FROM range(0, 10)").has_error
    assert not ddl.sql("ALTER TABLE db.br CREATE BRANCH stage").has_error
    tbl = ddl.catalog.load_table("db", "br")
    tbl.append(spark.range(10, 25).toDF("id"), branch="stage")
    # main untouched until publish
    assert ddl.query("SELECT COUNT(*) AS n FROM db.br").collect()[0].n == 10
    r = ddl.sql("CALL system.fast_forward('db.br', branch => 'stage')")
    assert not r.has_error and "published 1 snapshot" in r.message_list[-1]
    assert ddl.query("SELECT COUNT(*) AS n FROM db.br").collect()[0].n == 25
    # divergence refuses through the SQL surface too
    assert not ddl.sql("ALTER TABLE db.br CREATE BRANCH s2").has_error
    tbl = ddl.catalog.load_table("db", "br")
    tbl.append(spark.range(100, 101).toDF("id"), branch="s2")
    assert not ddl.sql("INSERT INTO db.br VALUES (999)").has_error
    r = ddl.sql("CALL system.fast_forward('db.br', branch => 's2')")
    assert r.has_error and any(
        "does not fast-forward" in m for m in r.message_list
    )
    assert not ddl.sql("ALTER TABLE db.br DROP BRANCH s2").has_error
    r = ddl.sql("CALL system.fast_forward('db.br', branch => 's2')")
    assert r.has_error


def test_version_as_of_resolves_branch_names(spark, ddl):
    """Iceberg's VERSION AS OF accepts any ref: a branch name reads
    the branch's staged state through SQL."""
    assert not ddl.sql("CREATE TABLE db.vb (id BIGINT)").has_error
    assert not ddl.sql("INSERT INTO db.vb SELECT id FROM range(0, 8)").has_error
    assert not ddl.sql("ALTER TABLE db.vb CREATE BRANCH stage").has_error
    tbl = ddl.catalog.load_table("db", "vb")
    tbl.append(spark.range(8, 20).toDF("id"), branch="stage")
    n_main = ddl.query("SELECT COUNT(*) AS n FROM db.vb").collect()[0].n
    n_br = ddl.query(
        "SELECT COUNT(*) AS n FROM db.vb VERSION AS OF 'stage'"
    ).collect()[0].n
    assert (n_main, n_br) == (8, 20)


def test_ref_names_with_dashes_through_sql(ddl):
    """Iceberg ref names permit dashes/dots; the ALTER grammar must
    manage the same names the engine API creates."""
    assert not ddl.sql("CREATE TABLE db.rn (id BIGINT)").has_error
    assert not ddl.sql("INSERT INTO db.rn VALUES (1)").has_error
    r = ddl.sql("ALTER TABLE db.rn CREATE TAG first-batch")
    assert not r.has_error, r.message_list
    r = ddl.sql("ALTER TABLE db.rn CREATE BRANCH wap.audit-1")
    assert not r.has_error, r.message_list
    n = ddl.query(
        "SELECT COUNT(*) AS n FROM db.rn VERSION AS OF 'first-batch'"
    ).collect()[0].n
    assert n == 1
    assert not ddl.sql("ALTER TABLE db.rn DROP TAG first-batch").has_error
    assert not ddl.sql("ALTER TABLE db.rn DROP BRANCH wap.audit-1").has_error


def test_changes_metadata_table_sql(ddl):
    """db.tbl.changes binds the full-range CDC changelog into SQL."""
    ddl.sql("CREATE TABLE db.cd (id BIGINT, v STRING)")
    ddl.sql("INSERT INTO db.cd VALUES (1, 'a'), (2, 'b')")
    ddl.sql("INSERT INTO db.cd VALUES (3, 'c')")
    ddl.sql("DELETE FROM db.cd WHERE id = 1")
    rows = ddl.query(
        "SELECT _change_ordinal AS o, _change_type AS t, COUNT(*) AS n "
        "FROM db.cd.changes GROUP BY o, t ORDER BY o, t"
    ).collect()
    assert [(r.o, r.t, r.n) for r in rows] == [
        (0, "insert", 2), (1, "insert", 1), (2, "delete", 1),
    ]


def test_history_partitions_metadata_tables_sql(ddl):
    ddl.sql("CREATE TABLE db.hp (id BIGINT)")
    ddl.sql("INSERT INTO db.hp VALUES (1), (2)")
    ddl.sql("INSERT INTO db.hp VALUES (3)")
    h = ddl.query(
        "SELECT COUNT(*) AS n, "
        "COUNT(parent_id) AS with_parent FROM db.hp.history"
    ).collect()[0]
    assert (h.n, h.with_parent) == (2, 1)
    p = ddl.query(
        "SELECT record_count FROM db.hp.partitions"
    ).collect()
    assert [r.record_count for r in p] == [3]


def test_delete_mode_position_via_sql(ddl):
    ddl.sql("CREATE TABLE db.pd (id BIGINT, k BIGINT) TBLPROPERTIES "
            "('write.delete.mode' = 'merge-on-read-position')")
    ddl.sql("INSERT INTO db.pd SELECT id, id % 7 FROM range(100)")
    r = ddl.sql("DELETE FROM db.pd WHERE k = 3")
    assert not r.has_error and "merge_on_read_position" in r.message_list[-1]
    table = ddl.catalog.load_table("db", "pd")
    assert any(s.delete_pos_dir for s in table.snapshots)
    assert ddl.query(
        "SELECT COUNT(*) AS n FROM db.pd"
    ).collect()[0]["n"] == 100 - 14  # ids 3,10,...,94
    # no-match DELETE: accumulated message, no commit
    n = len(table.snapshots)
    r = ddl.sql("DELETE FROM db.pd WHERE k = 999")
    assert not r.has_error and "no row matched" in r.message_list[-1]
    assert len(ddl.catalog.load_table("db", "pd").snapshots) == n


def test_show_create_table_roundtrip(ddl):
    """SHOW CREATE TABLE emits a statement this front-end re-executes
    to an equivalent table — schema (incl. nested + NOT NULL),
    partition spec, and properties all survive the round trip."""
    ddl.sql(
        "CREATE TABLE sc.src (ts TIMESTAMP_NTZ, v INT NOT NULL, "
        "address STRUCT<city: STRING, zip: STRING>) "
        "PARTITIONED BY (days(ts)) "
        "TBLPROPERTIES ('write.target-size' = '512m')"
    )
    stmt = ddl.query("SHOW CREATE TABLE sc.src").collect()[0][0]
    assert stmt.startswith("CREATE TABLE sc.src (")
    # re-execute under a new name
    r = ddl.sql(stmt.replace("sc.src", "sc.dst", 1))
    assert not r.has_error, (stmt, r.message_list)
    a = ddl.catalog.load_table("sc", "src")
    b = ddl.catalog.load_table("sc", "dst")
    assert _norm(a.schema) == _norm(b.schema)
    assert [(f.source_column, f.transform) for f in a.partition_spec.fields] \
        == [(f.source_column, f.transform) for f in b.partition_spec.fields]
    assert b.properties.get("write.target-size") == "512m"

def test_alter_table_rename_to(spark, ddl):
    """r13 (VERDICT r12 item 3): ALTER TABLE db.t RENAME TO [db2.]t2 —
    path-catalog flavor moves the table dir; snapshots, time travel,
    branches, and the declared sort order ride along (every manifest
    path is table-relative)."""
    r = ddl.sql(
        "CREATE TABLE d.src (k BIGINT, v STRING) "
        "TBLPROPERTIES ('write.sort-order' = 'k')"
    )
    assert not r.has_error, r.message_list
    ddl.sql("INSERT INTO d.src VALUES (1, 'a'), (2, 'b')")
    ddl.sql("INSERT INTO d.src VALUES (3, 'c')")
    t = ddl.catalog.load_table("d", "src")
    first = t.snapshots[0].snapshot_id
    t.create_tag("v1", first)

    r = ddl.sql("ALTER TABLE d.src RENAME TO d.dst")
    assert not r.has_error, r.message_list
    assert r.table_name == "dst"
    assert ddl.catalog.load_table("d", "src") is None
    t2 = ddl.catalog.load_table("d", "dst")
    assert t2 is not None and t2.meta["identifier"] == "d.dst"
    assert t2.to_df(spark).count() == 3
    # time travel + tag survive the move
    assert t2.to_df(spark, as_of_snapshot=first).count() == 2
    assert t2.to_df(spark, as_of_snapshot="v1").count() == 2
    assert t2.sort_order_fields[0]["column"] == "k"
    # cross-database rename
    r = ddl.sql("ALTER TABLE d.dst RENAME TO d2.far")
    assert not r.has_error, r.message_list
    assert ddl.catalog.load_table("d2", "far").to_df(spark).count() == 3
    # guards: missing source, occupied target
    r = ddl.sql("ALTER TABLE d.gone RENAME TO d.x")
    assert r.has_error
    ddl.sql("CREATE TABLE d2.block (k BIGINT)")
    r = ddl.sql("ALTER TABLE d2.far RENAME TO d2.block")
    assert r.has_error and "already exists" in " ".join(r.message_list)
    # unqualified target stays in the same database
    r = ddl.sql("ALTER TABLE d2.far RENAME TO near")
    assert not r.has_error, r.message_list
    assert ddl.catalog.table_exists("d2", "near")
    # appends keep working after the move
    ddl.sql("INSERT INTO d2.near VALUES (4, 'd')")
    assert ddl.catalog.load_table("d2", "near").to_df(spark).count() == 4

def test_truncate_table(spark, ddl):
    """TRUNCATE TABLE: one overwrite commit with an empty frame —
    schema/spec/properties survive, time travel reaches the pre-
    truncate state, and appends resume normally."""
    ddl.sql("CREATE TABLE d.tr (k BIGINT, v STRING)")
    ddl.sql("INSERT INTO d.tr VALUES (1, 'a'), (2, 'b')")
    t = ddl.catalog.load_table("d", "tr")
    pre = t.snapshots[-1].snapshot_id
    r = ddl.sql("TRUNCATE TABLE d.tr")
    assert not r.has_error, r.message_list
    t = ddl.catalog.load_table("d", "tr")
    assert t.to_df(spark).count() == 0
    assert [f.name for f in t.schema.fields] == ["k", "v"]
    assert t.to_df(spark, as_of_snapshot=pre).count() == 2
    ddl.sql("INSERT INTO d.tr VALUES (3, 'c')")
    assert ddl.catalog.load_table("d", "tr").to_df(spark).count() == 1
    r = ddl.sql("TRUNCATE TABLE d.gone")
    assert r.has_error
