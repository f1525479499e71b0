"""raptor_service_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Recasts the reference RAPTOR RAG service (minhphu102003/Raptor-service,
snapshot at /root/reference) as a hierarchical grid tile tree over tables of
interleaved text+media documents:

* UMAP+GMM cluster levels  -> hierarchical grid-cell coarsening (geo/grid.py)
* pgvector HNSW cosine kNN -> grid-compacted kNN (operators/knn.py)
* chunk (doc_id, idx) rows -> span explode/regroup (operators/chunking.py)
* tree build loop          -> level-wise DataFrame job (operators/tree.py)
* collapsed/traversal      -> DataFrame programs (operators/retrieval.py)
* Postgres upserts/deletes -> snapshot-versioned parquet tables w/ Iceberg
                              semantics (io/catalog.py)

All heavy compute is Spark SQL expressions or vectorized pandas/Arrow UDFs —
no per-row Python (BASELINE.json input_hint).
"""

__version__ = "0.1.0"
