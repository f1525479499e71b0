"""Registry-wide scale lint (VERDICT r4 item 1): partition-less Window only
over bounded input.

A ``Window.orderBy(...)`` without ``partitionBy`` plans as a SINGLE-PARTITION
WindowExec: every input row moves through one task.  That is fine over a
bounded table (a ``limit`` result, a constant-cardinality aggregate like
res-4 cells or calendar days) and a scale-killer over anything O(data).

This lint walks the OPTIMIZED LOGICAL plan of every registry query at
sf0.001 and, for each Window node with an empty partitionSpec:

- auto-accepts it when a GlobalLimit/LocalLimit sits in the window's child
  subtree (bounded by construction — the TakeOrderedAndProject pattern);
- otherwise requires the query name in ``ALLOWLIST`` below, where every
  entry must state WHY the window input is bounded.

Any partition-less window over unbounded input that is not allowlisted
fails the lint.  Run:  python scripts/lint_window_partitions.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose partition-less windows run over inputs bounded by
# CONSTRUCTION, grouped by why the cardinality is constant (it must not
# grow with the corpus).  This is exactly the set the lint flags today —
# a new query with a partition-less agg/checkpoint window fails until it
# is added here with a justification.
_BOUNDED_BY = {
    # O(cells at a fixed grid resolution): ≤ 4^res rows regardless of SF
    "cells": [
        "cell_gini", "fdr_hotspots", "ppr_sweep_cut", "skew_report",
        "knapsack_sites", "hot_cells",
    ],
    # O(calendar buckets): the fixed observation window caps distinct
    # hours / days / day-granular event times (incl. day-pair diffs)
    "time": [
        "kaplan_meier", "nelson_aalen", "competing_risks", "stl_lite",
        "changepoint_detect", "page_hinkley", "allan_variance",
        "peak_prominence", "turning_points", "adoption_curve",
        "growth_accounting", "theils_u2", "siegel_slopes", "qn_scale",
        "runs_test", "permutation_entropy", "sample_entropy", "harrell_c",
        "leaderboard_churn",
    ],
    # O(distinct values of a bounded domain): integer-second lags/gaps
    # capped by the observation window, score/threshold grids, contingency
    # cells, frequency-of-frequency tables
    "values": [
        "join_size_estimate", "mann_whitney", "decision_stump",
        "boosted_stumps", "emd_values", "roc_auc", "cohen_kappa",
        "mcnemar", "xicor", "kuiper_test", "anderson_darling",
        "interarrival_fit", "doc_skyline", "speed_anomalies",
        "conformal_intervals", "conversion_lag_quantiles",
    ],
    # literal-key-bounded cohorts (id < <constant> by construction): the
    # remaining windows ride the B-replicate / distinct-value aggregates
    # of the pool plus two-phase rank offsets
    "pool": ["bootstrap_ci", "spearman_corr"],
    # dimension-catalog tables (parts), not O(fact rows)
    "dim": ["abc_analysis"],
    # two-phase global rank: the only partition-less window is the bucket
    # OFFSET cumsum over the O(buckets) count aggregate
    "two_phase": ["rfm_segments", "ppcc_expon", "ppcc_weibull",
                  "seq_packing"],
}

ALLOWLIST = {q: why for why, qs in _BOUNDED_BY.items() for q in qs}


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _subtree_kinds(node) -> set:
    return {n.getClass().getSimpleName() for n in _walk(node)}


def partitionless_windows(df):
    """(window_node, kind) for every partition-less Window in df's optimized
    logical plan.  kind:
      'limit' — a Limit bounds the input (the TakeOrderedAndProject pattern)
      'agg'   — input is an aggregate (bounded by group cardinality;
                allowlist-gated)
      'ckpt'  — input bottoms out at a localCheckpoint (LogicalRDD) with no
                raw scan in between: the checkpointed subplan is opaque
                here, so gate by allowlist like 'agg'
      'raw'   — window directly over an unaggregated table scan
                (LogicalRelation) — the single-partition scale killer."""
    out = []
    opt = df._jdf.queryExecution().optimizedPlan()
    for n in _walk(opt):
        if n.getClass().getSimpleName() == "Window" and n.partitionSpec().size() == 0:
            kinds = _subtree_kinds(n.child())
            if kinds & {"GlobalLimit", "LocalLimit"}:
                kind = "limit"
            elif "Aggregate" in kinds:
                kind = "agg"
            elif "LogicalRelation" not in kinds and "LogicalRDD" in kinds:
                kind = "ckpt"
            else:
                kind = "raw"
            out.append((n, kind))
    return out


def lint_query(name, df):
    """Return a violation string or None.

    HARD: any partition-less window over raw (non-aggregated, non-limited)
    input — never allowed, no allowlist (the exact VERDICT r4 criterion).
    SOFT: partition-less window over an Aggregate — allowed only when the
    query is allowlisted with a boundedness justification, so the set
    cannot silently grow."""
    wins = partitionless_windows(df)
    raw = [w for w, kind in wins if kind == "raw"]
    soft = [w for w, kind in wins if kind in ("agg", "ckpt")]
    if raw:
        return (
            f"{name}: {len(raw)} partition-less Window(s) over NON-AGGREGATED "
            "input (HARD — rewrite as TakeOrderedAndProject / two-phase "
            "prefix sum / partitioned window)"
        )
    if soft and name not in ALLOWLIST:
        return (
            f"{name}: {len(soft)} partition-less Window(s) over "
            "aggregated/checkpointed input and not in ALLOWLIST "
            "(add with a boundedness note)"
        )
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from raptor_service_spark.session import get_spark

    spark = get_spark("window-lint", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()
    violations, errors, n_allow, n_auto = [], {}, 0, 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            wins = partitionless_windows(df)
        except Exception as ex:  # build failure is its own signal
            errors[name] = str(ex)[:200]
            continue
        n_auto += sum(1 for _, kind in wins if kind == "limit")
        if any(kind in ("agg", "ckpt") for _, kind in wins) and name in ALLOWLIST:
            n_allow += 1
        v = lint_query(name, df)
        if v:
            violations.append(v)
    print(
        f"checked={len(qmap) if not only else len(only)} "
        f"limit-bounded-windows={n_auto} allowlisted-queries={n_allow} "
        f"violations={len(violations)} errors={len(errors)}"
    )
    for v in violations:
        print("VIOLATION", v)
    for k, e in errors.items():
        print("ERROR", k, e)
    spark.stop()
    sys.exit(1 if violations or errors else 0)


if __name__ == "__main__":
    main()
