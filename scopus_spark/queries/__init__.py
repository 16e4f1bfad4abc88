"""Declared queries — one module per SURVEY.md §2 category.

Each module registers (spark_fn, duckdb_oracle_sql) pairs via
``scopus_spark.registry.register``. Conventions C1–C7 (SURVEY §2.0) are
binding: identical aliases both sides, round(x,4) on every floating output,
deterministic ordering for order-sensitive constructs.
"""
