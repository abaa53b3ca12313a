"""sdg_data_catalog_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data/query capabilities of the
``sdg-ai/sdg_data_catalog`` reference pipeline (paper-catalog ETL, NER
dataflows, text cleaning, gazetteer matching, active-learning ranking),
built Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
columnar at rest (Parquet), Arrow-vectorized in flight, plus the
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Layout:
  session     - tuned SparkSession factory (AQE, Arrow, UTC)
  catalog     - table loaders for the driver's parquet star schema
  functions/  - reusable column-expression libraries (text, arrays, hashing)
  operators/  - composite operators (dedup, similarity, gazetteer, sampling)
  queries/    - the registered query surface (queries() + oracle_sql())
  streaming/  - Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
