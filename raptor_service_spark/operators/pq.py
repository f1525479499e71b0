"""Product-Quantization ANN with pure-codegen ADC scoring.

The third compression point on the repo's ANN ladder (f32 → f16 packing in
the grid index, int8 max-abs codes in knn_quantized, and now m×4-bit PQ
codes): vectors are split into ``m`` subspaces, each subvector is snapped to
the nearest of ``k`` codebook centroids, and a query is scored against the
codes via an Asymmetric Distance Computation (ADC) lookup table — at 100 TB
the codes column is dim·4/ (m·log2 k) × smaller than the float vectors and
the scan IS the cost, exactly the argument knn_quantized documents.

Spark-first construction — NO Python in the data path:

  * the codebooks are trained driver-side on a deterministic synthetic
    sample (numpy Lloyd, fixed seed/iterations — O(k·dim) driver state,
    the same posture as IVF training);
  * the trained centroids are embedded as LITERAL arithmetic in generated
    expression strings: per subspace, a literal array of k squared
    distances, ``array_position(ds, array_min(ds))`` for the code, and a
    literal ADC table lookup ``element_at(table, code)`` for the score —
    the whole encode+score pipeline is whole-stage codegen;
  * the SAME generated strings (modulo dialect: ``array(..)``/``[..]``,
    0/1-based element access, array_position/list_position) run in the
    DuckDB oracle, so code assignment and ADC score match the engine
    EXACTLY by construction — identical literals, identical left-fold
    float op order, identical first-min tie rule. A lossy ANN path with a
    bit-exact oracle.

Reference anchor: this generalizes the collapsed-tree kNN compression the
reference delegates to pgvector HNSW over halfvec (alembic 7c8c20d23172
init_schema halfvec cosine index) — recast per the graft as explicit
code columns + codegen scoring.
"""

from __future__ import annotations

import numpy as np

# Literal form valid AND double-typed in BOTH engines: Spark SQL parses a
# bare `0.123456` as DECIMAL (exact decimal arithmetic — different results
# than DuckDB's double), so every embedded constant is CAST to DOUBLE.
_FMT = "CAST({:.6f} AS DOUBLE)"


def train_pq_codebooks(
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    seed: int = 133,
    n_sample: int = 2048,
    iters: int = 10,
) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means on a synthetic unit-norm
    sample. Returns (m, k, dim//m) float64 ROUNDED to 6 dp — the rounding is
    what lets the centroids be embedded as identical literals in Spark and
    DuckDB expression text."""
    assert dim % m == 0
    dsub = dim // m
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_sample, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    books = np.empty((m, k, dsub))
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        cent = xs[:k].copy()  # deterministic init: first k sample rows
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                sel = xs[assign == j]
                if len(sel):
                    cent[j] = sel.mean(axis=0)
        books[s] = cent
    return np.round(books, 6)


def _sq_dist_literal(centroid: np.ndarray, elem_exprs: list[str]) -> str:
    """Literal squared-distance string: identical text (and so identical
    IEEE left-fold order) in both engines."""
    terms = [
        f"({e} - {_FMT.format(c)}) * ({e} - {_FMT.format(c)})"
        for e, c in zip(elem_exprs, centroid)
    ]
    return "(" + " + ".join(terms) + ")"


def pq_dist_array_exprs(
    books: np.ndarray, vec_col: str, dialect: str
) -> list[str]:
    """Per subspace: the literal array of k centroid distances for this
    row's subvector. dialect: 'spark' (0-based access, array(..)) or
    'duckdb' (1-based access, [..])."""
    m, k, dsub = books.shape
    out = []
    for s in range(m):
        if dialect == "spark":
            elems = [f"{vec_col}[{s * dsub + d}]" for d in range(dsub)]
        else:
            elems = [f"{vec_col}[{s * dsub + d + 1}]" for d in range(dsub)]
        dists = [_sq_dist_literal(books[s, j], elems) for j in range(k)]
        body = ", ".join(dists)
        out.append(f"array({body})" if dialect == "spark" else f"[{body}]")
    return out


def pq_code_expr(ds_col: str, dialect: str, k: int | None = None) -> str:
    """1-based index of the first minimum — the same tie rule both engines.

    Spark form references the distance array ONCE: zip each distance with its
    1-based index, take the struct array_min (lexicographic struct compare =
    first-min tie rule), read back ``.i``.  The naive
    ``array_position(ds, array_min(ds))`` inlines ``ds`` twice, and after
    CollapseProject merges the encode+score chain into one Project the m·k·dsub
    literal arithmetic doubled per reference — the generated processNext()
    blew past the JVM's 64 KB method limit (Janino "Code grows beyond 64 KB",
    BENCH_r03 tail) and Spark silently fell back to interpreted execution.
    zip_with is a higher-order function — a deliberate CodegenFallback
    expression: the same interpreted execution the silent fallback produced
    (measured equal-or-faster, pq_knn 3.3 -> 2.7 s at sf0.1), but VISIBLE
    in the plan and error-free under spark.sql.codegen.fallback=false,
    which bench.py and scripts/find_codegen_fallback.py now enforce (no
    compile is attempted, so nothing can fail at runtime).

    ``k`` defaults to ``size(ds_col)`` so a caller cannot silently truncate
    (or NULL-pad) the index sequence by omitting it with a codebook of a
    different subcode count (ADVICE r4); pass it only to pin a literal."""
    if dialect == "spark":
        n = f"size({ds_col})" if k is None else str(k)
        return (
            f"array_min(zip_with({ds_col}, sequence(1, {n}), "
            "(d, i) -> struct(d, i))).i"
        )
    return f"list_position({ds_col}, list_min({ds_col}))"


def adc_tables(books: np.ndarray, query: np.ndarray) -> np.ndarray:
    """(m, k) ADC lookup tables: squared distance from each query subvector
    to each centroid, rounded to 6 dp so both engines see identical
    literals. Computed ONCE driver-side — O(m·k·dsub)."""
    m, k, dsub = books.shape
    q = np.asarray(query, dtype=np.float64)
    t = ((q.reshape(m, 1, dsub) - books) ** 2).sum(axis=2)
    return np.round(t, 6)


def adc_score_expr(tables: np.ndarray, code_cols: list[str], dialect: str) -> str:
    """Sum of per-subspace table lookups — literal tables, codegen lookups."""
    parts = []
    for s, codes in enumerate(code_cols):
        lits = ", ".join(_FMT.format(v) for v in tables[s])
        if dialect == "spark":
            parts.append(f"element_at(array({lits}), cast({codes} as int))")
        else:
            parts.append(f"([{lits}])[{codes}]")
    return "(" + " + ".join(parts) + ")"


def ivf_pq_knn(
    df_with_list,
    centroids: np.ndarray,
    books: np.ndarray,
    q: np.ndarray,
    k: int,
    nprobe: int = 8,
    vec_col: str = "v",
    id_col: str = "id",
):
    """IVF-PQ: probe the nprobe nearest inverted lists (the partition-pruning
    half, operators/ivf.py), then rank candidates by codegen ADC score (the
    compression half above) — the classic two-level ANN layout where at
    100 TB the probed fraction is read as m×4-bit codes instead of floats.

    Driver state: IVF centroids + PQ codebooks (both O(KB)); data path:
    `list_id IN (...)` literal filter → generated encode/ADC Project →
    TakeOrderedAndProject. Recall/rerank behavior pytest-asserted in
    tests/test_pq.py; the two halves are independently oracle-checked by
    `ivf_knn_exact` (probe rule) and `pq_knn` (ADC scoring).
    """
    from pyspark.sql import functions as F

    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qn = np.asarray(q, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    order = np.argsort(-(cn @ qn), kind="stable")
    probe = [int(i) for i in order[: min(nprobe, len(cn))]]
    e = df_with_list.filter(F.col("list_id").isin(probe))
    m = books.shape[0]
    for s, ds in enumerate(pq_dist_array_exprs(books, vec_col, "spark")):
        e = e.withColumn(f"_ds{s}", F.expr(ds))
    for s in range(m):
        e = e.withColumn(
            f"_pc{s}", F.expr(pq_code_expr(f"_ds{s}", "spark", books.shape[1]))
        )
    score = F.expr(
        adc_score_expr(adc_tables(books, q), [f"_pc{s}" for s in range(m)], "spark")
    )
    return (
        e.select(id_col, F.round(score, 6).alias("pqdist"))
        .orderBy(F.col("pqdist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_encode_cols(books: np.ndarray, vec_col: str):
    """Index-time code materialization: the (1-based) PQ code per subspace
    as a compact array<int> column — write this next to (or instead of) the
    float vectors and the scan for every later query shrinks ~32×. Same
    generated argmin arithmetic as the inline path, so codes are identical
    by construction (pytest-asserted)."""
    from pyspark.sql import functions as F

    m, k = books.shape[0], books.shape[1]
    ds = pq_dist_array_exprs(books, vec_col, "spark")
    codes = [
        f"cast({pq_code_expr(d, 'spark', k)} as int)" for d in ds
    ]
    return F.expr("array(" + ", ".join(codes) + ")")


def adc_score_from_codes_expr(tables: np.ndarray, codes_col: str) -> str:
    """Query-time scoring over MATERIALIZED codes: m literal-table lookups —
    the expression is O(m·k) literals regardless of dim, so the codegen
    compile cost the inline path pays per query disappears."""
    parts = []
    for s in range(tables.shape[0]):
        lits = ", ".join(_FMT.format(v) for v in tables[s])
        parts.append(f"element_at(array({lits}), {codes_col}[{s}])")
    return "(" + " + ".join(parts) + ")"
