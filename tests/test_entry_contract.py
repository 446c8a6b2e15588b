"""Mirror of the driver's correctness gate: run every queries() entry
and compare row-count + column names + sorted canonical values against
its oracle_sql() twin via DuckDB."""

import datetime
import decimal
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Type-tagged canonical form, mirroring the driver's *typed* value
    hashing: a DuckDB HUGEINT (arrives as Decimal via Arrow) must NOT
    collapse to the same token as a Spark int64 — that masking is
    exactly how the r03 `domain_stats`/`pack_sequences` driver fails
    slipped past the old str()-based gate."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "b:%d" % int(v)
    if isinstance(v, int):
        return "i:%d" % v
    if isinstance(v, decimal.Decimal):
        return "dec:%s" % v
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:" + repr(round(v, 9))
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return "t:" + v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}={_canon(v[k])}" for k in sorted(v)) + "}"
    return type(v).__name__ + ":" + str(v)


def _rows_spark(df):
    cols = sorted(df.columns)
    rows = df.toArrow().to_pylist()
    return sorted(tuple(_canon(r[c]) for c in cols) for r in rows), cols


def _rows_duck(con, sql):
    tbl = con.execute(sql).arrow()
    names = list(tbl.schema.names)
    rows = tbl.to_pylist()
    return (sorted(tuple(_canon(r[c]) for c in sorted(names)) for r in rows),
            sorted(names))


ORACLES = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    assert name in ALL, f"oracle {name} lacks a queries() entry"
    got, gcols = _rows_spark(ALL[name](spark, SF_DIR))
    con = _duck(SF_DIR)
    want, wcols = _rows_duck(con, ORACLES[name])
    assert gcols == wcols, f"{name}: column names differ {gcols} vs {wcols}"
    assert len(got) == len(want), \
        f"{name}: row count {len(got)} vs {len(want)}"
    if got != want:
        diff_a = [r for r in got if r not in set(want)][:5]
        diff_b = [r for r in want if r not in set(got)][:5]
        raise AssertionError(f"{name}: values differ; ours-extra={diff_a} "
                             f"oracle-extra={diff_b}")


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"z", "x", "y", "num_features"} <= set(df.columns)
