"""PySpark-native analytics engine with the query and data-processing
capabilities of ``italovinicius18/lakehouse-file-format-compare``.

The reference (see SURVEY.md) is a medallion-architecture lakehouse
pipeline: synthetic bronze generation, incremental watermark + MERGE
silver loads across a format matrix, and four gold analytics queries.
This package re-expresses that surface as a standalone, deterministic,
infra-free PySpark library, plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
plumbing) designed for a 1000-executor / 100 TB deployment even though
it is tested on ``local[*]``.

Layout:
  session     SparkSession factory (AQE, UTC, Arrow; optional Delta/Iceberg)
  schemas     explicit StructType registry (no schema inference anywhere)
  sources/    readers: testdata parquet, CSV-with-schema, format probes
  storage     uniform table format layer: parquet | orc | csv | json (+avro/delta gated)
  operators/  merge (upsert/insert-only), dedup family, similarity, top-k, watermark
  functions/  text analysis, vector math — built-in-function compositions first
  plans/      the query library (gold analogs, TPC-H-style, ad-hoc operator demos)
  pipeline/   reference-parity medallion pipeline: generate → bronze → silver → gold
  streaming/  Structured Streaming incremental runner (AvailableNow + foreachBatch)
  ext/        multimodal binary-column plumbing (decode stubbed, plumbing real)
"""

__version__ = "0.1.0"
