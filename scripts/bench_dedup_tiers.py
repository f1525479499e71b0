"""Data-axis evidence for the dedup family (VERDICT r4 item 5).

Runs minhash_pairs / neardup_components / doc_dup_substrings /
curation_pipeline_v2 on 1x / 4x / 16x documents tiers and records wall
seconds + output rows + the shared shingle-stream size — the measured
(not argued) growth curves for SCALE.md.

Tier construction: k id-shifted replicas of the sf0.1 documents table;
replica r > 0 gets a per-TOKEN salt (every word suffixed with the replica
tag), so every shingle differs across replicas — replicas are fully
dissimilar and the base corpus's internal dup structure repeats k times:
outputs, candidates, and the shingle stream all grow ~linearly in k.
(Identical-text and one-token-salt replicas were tried first: 3-gram
near-dup similarity survives both, building C(2k,2) dup cliques per base
doc — outputs quadratic in k and one skewed merge key — which measures
the adversarial-clique regime, not data-axis scaling.)

Usage: python scripts/bench_dedup_tiers.py [--cpus 32] [--tiers 1,4,16]
Writes one JSON line per (tier, query) and a summary to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/dev/shm/spark_graft_bench"
SF01 = "/root/testdata/sf0.1"
QUERIES = (
    "minhash_pairs",
    "neardup_components",
    "doc_dup_substrings",
    "curation_pipeline_v2",
)


def tier_dir(k: int) -> str:
    return os.path.join(SCRATCH, f"docs_x{k}s_sf01")


def ensure_tier(spark, k: int) -> str:
    d = tier_dir(k)
    path = os.path.join(d, "documents.parquet")
    if os.path.exists(path):
        return d
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF01}/documents.parquet")
    parts = []
    for r in range(k):
        p = base.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(r * 10_000_000)).cast("long")
        )
        if r > 0:
            p = p.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{r}")
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    os.makedirs(d, exist_ok=True)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return d


def main() -> int:
    cpus = 32
    tiers = [1, 4, 16]
    args = sys.argv[1:]
    if "--cpus" in args:
        cpus = int(args[args.index("--cpus") + 1])
    if "--tiers" in args:
        tiers = [int(x) for x in args[args.index("--tiers") + 1].split(",")]

    import __spark_entry__ as entry_mod
    from raptor_service_spark.session import get_spark

    spark = get_spark("dedup-tiers", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()
    rows_out = []
    for k in tiers:
        d = ensure_tier(spark, k)
        n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
        # shared shingle stream size (the dominant intermediate for the
        # minhash/jaccard/substring family)
        t0 = time.perf_counter()
        sh = entry_mod._shared_shingles3(spark, d)
        n_shingles = sh.count()
        t_sh = round(time.perf_counter() - t0, 2)
        print(json.dumps({"tier": k, "n_docs": n_docs,
                          "n_shingles": n_shingles, "shingle_sec": t_sh}))
        for name in QUERIES:
            t0 = time.perf_counter()
            df = qmap[name](spark, d)
            n = df.count()
            wall = round(time.perf_counter() - t0, 2)
            rec = {"tier": k, "query": name, "wall_sec": wall, "out_rows": n,
                   "n_docs": n_docs}
            rows_out.append(rec)
            print(json.dumps(rec))
    print(json.dumps({"summary": rows_out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
