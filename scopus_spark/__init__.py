"""scopus_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the ``ctds-usyd/scopus`` reference (bibliographic-snapshot
ETL to a relational schema + downstream relational analytics), re-expressed
as Spark DataFrame / SQL plans, plus the LLM-data-pipeline operator surface
(dedup, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7.2):
- DataFrame-first; Catalyst does the optimization; no driver-side
  materialization inside operators.
- Every declared operator has a DuckDB-checkable oracle (SURVEY.md §2).
- Designed for 100 TB scale: broadcast bounded dims only, candidate-pruning
  paths for quadratic ops, watermark-bounded streaming state.

NOTE: the reference mount ``/root/reference`` was empty at survey AND build
time, so reference citations are capability-level (SURVEY.md §0.1) and no
code herein derives from it.
"""

__version__ = "0.1.0"
