"""Query registry: every operator from SURVEY.md §2 (+ north-star ops).

Importing this package populates :data:`registry.QUERIES`. Each entry has
a PySpark implementation and (when SQL-expressible) a DuckDB oracle SQL
string the driver diffs against at sf=0.01.
"""

from . import core, joins, aggregates, windows, sets, text, dedup, similarity, extra, tpch, reshape  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401
