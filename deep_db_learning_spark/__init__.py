"""deep_db_learning_spark — a PySpark-native relational-deep-learning
analytics engine with the capabilities of `LukasZahradnik/deep-db-learning`
(reference read-only at /root/reference), re-expressed Spark-first:

- schema/    semantic-type IR (cat/num/date/datetime/duration/time/text/omit)
- sources/   parquet/JDBC catalog + materialized store
- profiling/ single-pass column profiler + schema-inference decision tree
- functions/ column converters, normalizers, portable hashing, text/vector fns
- operators/ FK-graph build, BFS, sampling, message passing, dedup, similarity
- plans/     end-to-end pipelines (profile → convert → graph → train)
- streaming/ Structured Streaming ingestion of the events table
"""

__version__ = "0.1.0"
