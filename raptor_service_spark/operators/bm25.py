"""BM25 keyword retrieval + hybrid keyword/vector score fusion.

The reference retrieves by vector cosine only
(services/retrieval/retrieval_service.py:96-141); production RAG engines
pair that with a keyword leg and fuse scores. This is the Spark-first
relational formulation — no inverted-index service, the index IS a
DataFrame:

    postings:  explode(tokens) → groupBy(doc, term).count()      (one shuffle)
    doc stats: groupBy(doc).count()                              (same scan)
    df/idf:    postings.groupBy(term).count()  → tiny, broadcast
    score:     postings ⋈ query terms (broadcast IN-list)
               ⋈ idf (broadcast) → codegen arithmetic → top-k

Every step is relational + codegen (log/ln arithmetic identical in the
DuckDB oracle). At 100 TB the postings shuffle is the only big exchange and
it is the standard build-an-index cost; query-time work is pruned to the
query terms via broadcast.

BM25 (k1=1.2, b=0.75):
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·len_d/avg_len))
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75

# lowercase word tokens, identical regex semantics in Java regex and RE2
TOKEN_PATTERN = "[a-z0-9]+"


def tokenize(text: F.Column) -> F.Column:
    """array of lowercase word tokens (codegen regexp extract-all)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def doc_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf) + per-doc length — one explode + one shuffle."""
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact BM25 top-k: (doc_id, score) with score rounded to 6 dp and
    (score DESC, id ASC) deterministic order."""
    # Materialize the postings ONCE: dlen / corpus stats / df / the query
    # probe all derive from it, and without the checkpoint Catalyst re-runs
    # the corpus explode+agg per branch (4 full scans at 100 TB). In a
    # deployed engine this is the persisted index table; here the
    # localCheckpoint (dedup.py convention) stands in for it.
    post = doc_postings(docs, id_col, text_col).localCheckpoint(eager=False)
    dlen = post.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dlen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avg_dl")
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = [t.lower() for t in query_terms]
    hit = post.filter(F.col("term").isin(qterms))
    scored = (
        hit.join(F.broadcast(dfreq), "term")
        .join(dlen, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avg_dl")
    )
    contrib = idf * F.col("tf") * F.lit(K1 + 1.0) / denom
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_sql(
    table: str, query_terms: list[str], k: int, id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of bm25_topk (identical arithmetic, ln base e)."""
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
        WITH post AS (
            SELECT {id_col}, t.term, COUNT(*) AS tf
            FROM {table},
                 unnest(regexp_extract_all(lower({text_col}),
                        '{TOKEN_PATTERN}', 0)) AS t(term)
            GROUP BY 1, 2),
        dlen AS (SELECT {id_col}, SUM(tf) AS dl FROM post GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avg_dl FROM dlen),
        dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1)
        SELECT p.{id_col},
               ROUND(SUM(
                   ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * p.tf * {K1 + 1.0}
                   / (p.tf + {K1} * ({1.0 - B} + {B} * l.dl / s.avg_dl))
               ), 6) AS score
        FROM post p
        JOIN dfreq f USING (term)
        JOIN dlen l USING ({id_col})
        CROSS JOIN stats s
        WHERE p.term IN ({terms})
        GROUP BY 1
        ORDER BY score DESC, p.{id_col} ASC
        LIMIT {k}
    """
