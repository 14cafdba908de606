"""etl_tool_rep_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL tool
(rajatparida125/etl-tool-rep, surveyed in SURVEY.md), extended with the
core relational, streaming-shaped, and LLM-data-pipeline operators a
large-scale (100 TB posture) training-data platform needs.

Layout:
  session    — SparkSession factory (AQE on, UTC, Arrow)
  catalog    — parquet table loaders / temp-view registration
  pipeline   — declarative rule-pipeline spec -> compiled single select
               (reference parity: main.py:130-176 semantics)
  operators  — relational / temporal / dedup / knn / text operators
  sources    — CSV / pipe / JSON / Excel / sniffing / SFTP readers
  sinks      — parquet / csv writers (partitioned, 100 TB posture)
  streaming  — Structured Streaming wiring
"""

__version__ = "0.1.0"
