"""tp_integ_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL application
``gab-mol/tp_integ_data_pipeline`` (see SURVEY.md), built Spark-first:

- DataFrame/SQL logical plans, Catalyst optimization, AQE.
- Partitioned parquet data lake with anti-join dedup writers
  (reference: main.py:80-150) instead of read-back membership checks.
- Column-expression transform library (reference transf.py:36-134)
  that stays inside whole-stage codegen — no Python UDFs in the hot
  path.
- Plain-Spark MERGE (SCD1 upsert / insert-if-absent) re-expressing
  the reference's server-side SQL MERGE (transf.py:208-366).
- Structured Streaming micro-batch ingestion (reference
  main.py:284-325 polling thread).
- Extension operators for LLM-scale data pipelines: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
  search, text analysis, multimodal column plumbing.

Designed for a 1000-executor cluster over ~100 TB: no driver-side
collects in any operator, broadcast joins for bounded dims, AQE for
skew, partition-pruned lake layout.
"""

__version__ = "0.1.0"
