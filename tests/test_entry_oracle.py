"""Replay the driver's correctness gate: every queries() entry vs its
oracle_sql() through DuckDB, exact value comparison after the shared
round(6) convention (the driver hashes values, so exact is the bar)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _canon(a) -> str:
    """Driver-faithful canonical form: the driver stringifies cells before
    hashing, so int 357 vs float 357.0 (and -0.0 vs 0.0) MUST differ here.

    numpy scalars unwrap to Python scalars first so np.int64(3) == 3."""
    if a is None:
        return "<null>"
    if hasattr(a, "tolist"):  # numpy array → nested python list
        a = a.tolist()
    if isinstance(a, (list, tuple)):
        return "[" + ", ".join(_canon(x) for x in a) + "]"
    if hasattr(a, "item") and not isinstance(a, dict):
        try:
            a = a.item()
        except (AttributeError, ValueError):
            pass
    if isinstance(a, float) and math.isnan(a):
        return "<null>"
    return repr(a)


def _cmp_cell(a, b) -> bool:
    return _canon(a) == _canon(b)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_vs_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    if name not in sqls:
        # genuinely non-SQL-expressible op → the driver records a weaker
        # rows-only check; mirror that here
        df = q(spark, SF_DIR)
        assert df.count() >= 0 and len(df.columns) > 0
        return
    got = q(spark, SF_DIR).toPandas()
    want = con.execute(sqls[name]).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs oracle {len(want)}"
    assert sorted(got.columns) == sorted(c.lower() for c in want.columns), (
        f"{name}: cols {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    want.columns = [c.lower() for c in want.columns]
    g, w = _normalize(got), _normalize(want)
    bad = []
    for i in range(len(g)):
        for c in g.columns:
            a, b = g[c].iloc[i], w[c].iloc[i]
            a = None if (isinstance(a, float) and math.isnan(a)) else a
            b = None if (isinstance(b, float) and math.isnan(b)) else b
            if not _cmp_cell(a, b):
                bad.append((i, c, a, b))
    assert not bad, f"{name}: {len(bad)} mismatches, first 5: {bad[:5]}"


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and "value" in df.columns
