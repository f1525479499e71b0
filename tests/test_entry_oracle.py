"""Replicates the driver's correctness gate: every queries() entry with an
oracle_sql() runs on Spark AND DuckDB at sf0.001; row sets must match exactly
(order-insensitive, column-name aligned) — the same comparison the driver
does at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    # The driver hashes via Arrow, where DuckDB's HUGEINT (e.g. an un-cast
    # integer SUM) becomes decimal128 and formats differently from Spark's
    # BIGINT even when values are identical. Guard the type at the source.
    arrow_types = {
        f.name: str(f.type) for f in duck.execute(ORACLES[name]).arrow().schema
    }
    decimals = {c: t for c, t in arrow_types.items() if t.startswith("decimal")}
    assert not decimals, (
        f"{name}: oracle emits decimal-typed columns {decimals} — wrap the "
        f"aggregate in CAST(... AS BIGINT/DOUBLE) to match Spark's type"
    )

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mism = [x for x, y in zip(a, b) if x != y]
    assert a == b, f"{name}: value mismatch, first diffs: {mism[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "dist"]


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
