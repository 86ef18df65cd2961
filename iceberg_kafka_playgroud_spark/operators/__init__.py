"""Operator inventory (SURVEY §2).

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL on the fixture
views). ``__spark_entry__`` merges them all.
"""
