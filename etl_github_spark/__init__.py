"""etl_github_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference pipeline (coiled/etl-github: GH Archive
NDJSON -> six normalized tables -> date-partitioned lakehouse ->
text-mining analytics queries), plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): declarative DataFrame/SQL plans, explicit
StructType schemas, Catalyst/AQE does the optimization, zero custom
Catalyst rules, UDFs only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"
