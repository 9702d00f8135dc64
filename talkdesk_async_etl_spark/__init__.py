"""talkdesk_async_etl_spark — a PySpark-native analytics & pipeline engine.

A from-scratch re-expression of the capabilities of the reference repo
``rohitsagar363/talkdesk-async-etl`` (a config-driven async ETL
orchestrator) as an idiomatic Spark engine:

- all relational/query capability expressed as Catalyst logical plans
  (DataFrame / SQL API) so predicate pushdown, column pruning, broadcast
  selection, AQE and whole-stage codegen apply for free;
- the pipeline (config scan -> join -> fan-out -> ingest -> sink ->
  monitoring) as one engine with three execution profiles
  (local / driver-async / distributed ``mapInPandas``), mirroring the
  reference's three codepaths (reference README.md:5-8);
- north-star extension operators for LLM-scale data pipelines: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  similarity search, text analysis, streaming windows.

Design rules (see SURVEY.md §4, §7):
- DataFrame-first, RDD never (the reference's ``rdd.foreachPartition``
  pattern is replaced by ``mapInPandas`` returning status rows).
- No ``collect()`` of payload data; driver materializes only
  orchestration-boundary config rows.
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs where Python is unavoidable; row-at-a-time UDFs nowhere.
"""

__version__ = "0.1.0"
