"""Mirror of the driver's correctness gate: run every queries() entry
and compare row-count + column names + sorted canonical values against
its oracle_sql() twin via DuckDB."""

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
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_spark(df):
    cols = sorted(df.columns)
    return sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect()), cols


def _rows_duck(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = cur.fetchall()
    return (sorted(tuple(_canon(r[i]) for i in order) for r in rows),
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
