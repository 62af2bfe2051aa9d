"""movies_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (CocoLB/08-Movies-ETL, surveyed in SURVEY.md),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, scalar logic as native column expressions (zero row-at-a-time
Python UDFs in the hot path), Pandas UDFs only where built-ins cannot
express the semantics (multimodal container decode, stateful streaming).

Layout
------
sources/    readers (parquet/csv/json with explicit schemas) and sinks
functions/  the scalar expression library (money/date/runtime parsing, …)
operators/  relational operators, normalization, dedup, similarity, text
plans/      query registry (queries()/oracle_sql()) and the ETL pipeline
streaming/  structured-streaming operators (windowed aggs, sessionization)
"""

__version__ = "0.1.0"
