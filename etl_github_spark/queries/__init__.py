"""Query registry: every operator from SURVEY.md §2 (+ north-star ops).

Importing this package populates :data:`registry.QUERIES`. Each entry has
a PySpark implementation and (when SQL-expressible) a DuckDB oracle SQL
string the driver diffs against at sf=0.01.
"""

# Registration order matters: the driver's correctness gate verifies queries in
# registration order (bounded window), so the highest-value / least-recently-verified
# modules register first. Round 2 rotation: the LLM-pipeline surface
# (text/dedup/similarity), TPC-H shapes, extra, reshape, and sets lead (50 entries —
# all 48 queries unverified in round 1 plus two green canaries); the round-1-verified
# core/joins/aggregates/windows follow.
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401
