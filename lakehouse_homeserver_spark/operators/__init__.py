"""Operator library: one named query per SURVEY.md §2 capability.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same parquet
views). The top-level registry merges them for ``__spark_entry__``.
"""
