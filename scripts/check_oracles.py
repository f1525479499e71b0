"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, compares row count, schema width, and a
value hash over name-sorted columns — the same compare the driver records in
CORRECTNESS_r{N}.json.  Usage::

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""
from __future__ import annotations

import hashlib
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _norm(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from raptor_service_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, os_ = mod.queries(), mod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name not in os_:
            print(f"{name:35s} rows-only (no oracle)")
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"{name:35s} ERROR: {type(e).__name__}: {e}")
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (
            rows_ok
            and schema_ok
            and value_hash(srows, scols) == value_hash(orows, ocols)
        )
        mark = "OK " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if mark != "OK ":
            bad += 1
        schema_note = "=" if schema_ok else f"{sorted(scols)}|{sorted(ocols)}"
        print(
            f"{name:35s} {mark} rows={len(srows)}/{len(orows)} "
            f"schema={schema_note} hash={'=' if hash_ok else 'X'}"
        )
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
