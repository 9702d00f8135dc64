"""The pipeline engine: the reference's config-driven ETL job,
re-expressed as one Spark-native pipeline with three execution
profiles (local / driver-async / distributed mapInPandas)."""
