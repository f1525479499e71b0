"""Maximal-Marginal-Relevance (MMR) diversification re-rank.

The reference's retrieve path re-ranks a candidate set with an external
reranker model (services/retrieval/retrieval_service.py:143-157); the
deterministic score-fusion analog is operators/retrieval.rerank_chunks.
MMR is the third re-rank the surface needs: diversity-aware selection,
greedily picking k results that balance relevance against redundancy

    pick_1 = argmax rel_i
    pick_t = argmax_{i not selected} [ lam * rel_i
                                       - (1 - lam) * max_{j selected} sim(i, j) ]

ties broken on ascending id. It cannot be expressed as a window/join (each
pick depends on all previous picks), so it runs as a grouped Arrow kernel —
exactly the operator class the brief reserves for ``applyInPandas``.

Scale shape at 100 TB: candidates are a per-query TOP-N (bounded BY
CONSTRUCTION, e.g. 15), so the kernel's group is O(N²) pair rows regardless
of corpus size; with millions of concurrent queries the pair table shuffles
ONCE on qid and every group fits trivially in an Arrow batch. All float
inputs (rel, pairwise sim) are computed JVM-side with the engine's proven
cosine fold and ROUNDED to 6 dp BEFORE entering the kernel; the kernel does
only IEEE-identical ``lam * rel - (1-lam) * max`` arithmetic and
comparisons, so the DuckDB oracle (an unrolled k-step CTE chain over the
same rounded inputs) selects identically — parity by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_select(
    pairs: DataFrame,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Greedy MMR selection over a per-query candidate pair table.

    ``pairs`` columns: qid (string), id_a (long), rel_a (double, 6-dp), id_b
    (long), sim (double, 6-dp pairwise similarity, including the self pair).
    Returns (qid, rank, id, mmr_score) with rank 1..k; score_1 = lam * rel.
    """

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["qid"].iloc[0]
        rel = (
            pdf.drop_duplicates("id_a").set_index("id_a")["rel_a"].to_dict()
        )
        sim = {(r.id_a, r.id_b): r.sim for r in pdf.itertuples()}
        remaining = sorted(rel)  # ascending id = tie order
        selected: list[tuple[int, float]] = []
        while remaining and len(selected) < k:
            best_id, best_score = None, None
            for i in remaining:
                if selected:
                    red = max(sim[(i, j)] for j, _ in selected)
                    score = lam * rel[i] - (1.0 - lam) * red
                else:
                    score = lam * rel[i]
                if best_score is None or score > best_score:
                    best_id, best_score = i, score
            selected.append((best_id, best_score))
            remaining.remove(best_id)
        return pd.DataFrame(
            {
                "qid": qid,
                "rank": range(1, len(selected) + 1),
                "id": [i for i, _ in selected],
                "mmr_score": [round(s, 6) for _, s in selected],
            }
        )

    return (
        pairs.groupBy("qid")
        .applyInPandas(_kernel, "qid string, rank int, id long, mmr_score double")
        .orderBy("qid", "rank")
    )


def mmr_oracle_sql(cand_sql: str, sims_sql: str, k: int = 5, lam: float = 0.7) -> str:
    """Unrolled k-step MMR as a DuckDB CTE chain.

    ``cand_sql``: yields (qid, id, rel) — rel 6-dp rounded.
    ``sims_sql``: yields (qid, id_a, id_b, sim) — 6-dp, self pairs included.
    Each step picks the argmax of lam*rel - (1-lam)*max(sim to selected),
    ties on ascending id — the same IEEE double arithmetic the kernel runs.
    """
    lam_s = f"CAST({lam!r} AS DOUBLE)"
    inv_s = f"(1.0 - {lam_s})"
    ctes = [f"cand AS ({cand_sql})", f"sims AS ({sims_sql})"]
    ctes.append(
        f"""s1 AS (
        SELECT qid, id, {lam_s} * rel AS score, 1 AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY {lam_s} * rel DESC, id) AS rn
            FROM cand) WHERE rn = 1)"""
    )
    sel_union = "SELECT qid, id FROM s1"
    for t in range(2, k + 1):
        prev_sel = f"sel{t - 1}"
        ctes.append(f"{prev_sel} AS ({sel_union})")
        ctes.append(
            f"""s{t} AS (
            SELECT qid, id, score, {t} AS rank FROM (
                SELECT c.qid, c.id,
                       {lam_s} * c.rel - {inv_s} * MAX(m.sim) AS score,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.qid
                           ORDER BY {lam_s} * c.rel - {inv_s} * MAX(m.sim) DESC,
                                    c.id) AS rn
                FROM cand c
                JOIN {prev_sel} p ON p.qid = c.qid
                JOIN sims m ON m.qid = c.qid AND m.id_a = c.id AND m.id_b = p.id
                WHERE c.id NOT IN (SELECT id FROM {prev_sel} WHERE qid = c.qid)
                GROUP BY c.qid, c.id, c.rel)
            WHERE rn = 1)"""
        )
        sel_union += f" UNION ALL SELECT qid, id FROM s{t}"
    picks = " UNION ALL ".join(
        f"SELECT qid, rank, id, ROUND(score, 6) AS mmr_score FROM s{t}"
        for t in range(1, k + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({picks}) ORDER BY qid, rank"
    )
