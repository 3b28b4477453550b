"""Corpus/stream analytics extensions: collocation mining, moment-based
outlier flags, gap-filled time series, equi-depth histograms, Zipf rank
tables.

Determinism strategy (registry docstring): libm transcendentals differ
across engines, so there is no log() (collocations use *lift*, the
monotone exp-free cousin of PMI) and no sqrt() (the z-score test
compares squared integer moments). Every score is a single int64/int64 division
in double — correctly rounded identically by Spark and DuckDB.

Registered after the round-2 driver window (first-50 rule); locally
oracle-checked by tests/test_oracle_parity.py regardless.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._util import T, fxp, par
from .registry import query


def _words():
    return F.split(F.col("text"), " ")


@query(
    "text_collocations_lift",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    n_uni AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
    big AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                   unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS w2
            FROM t)
      GROUP BY w1, w2
    ),
    n_big AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM big)
    SELECT b.w1, b.w2, b.c12,
           (b.c12 * nu * nu) / (u1.c * u2.c * nb) AS lift
    FROM big b
    JOIN uni u1 ON u1.w = b.w1
    JOIN uni u2 ON u2.w = b.w2
    CROSS JOIN n_uni CROSS JOIN n_big
    WHERE b.c12 >= 10
    """,
    tags=("text", "analytics"),
)
def text_collocations_lift(spark, sf_dir):
    """Collocation mining by lift — P(w1 w2) / (P(w1)·P(w2)), i.e. PMI
    without the log (log is libm-dependent and lift orders pairs the
    same way). lift = c12·Nu² / (c1·c2·Nb), one exact int64 product
    ratio evaluated in double.

    Shape: unigram and bigram count aggregations (shuffle = |vocab| and
    |bigram vocab|), then the bigram table joins the two unigram counts —
    vocabulary-sized sides, broadcast. Overflow bound: c12·Nu² needs
    Nu ≤ ~3e9 tokens in int64; past that, promote the moment products to
    DECIMAL(38,0) — the comparison stays exact.
    """
    w = F.col("_w")
    t = (
        par(T(spark, sf_dir, "documents"))
        .select("doc_id", _words().alias("_w"))
        .where(F.size(w) >= 2)
    )
    uni = t.select(F.explode(w).alias("w")).groupBy("w").agg(F.count("*").alias("c"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.struct(
            F.element_at(w, i).alias("w1"), F.element_at(w, i + 1).alias("w2")
        ),
    )
    big = (
        t.select(F.explode(bigrams).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    n_uni = uni.agg(F.sum("c").alias("nu"))
    n_big = big.agg(F.sum("c12").alias("nb"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        big.where(F.col("c12") >= 10)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            "c12",
            (
                (F.col("c12") * F.col("nu") * F.col("nu"))
                / (F.col("c1") * F.col("c2") * F.col("nb"))
            ).alias("lift"),
        )
    )


@query(
    "stat_outliers_zscore",
    sql="""
    WITH m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           4 * (d.n_chars * m.n - m.s1) * (d.n_chars * m.n - m.s1)
             > 9 * (m.n * m.s2 - m.s1 * m.s1) AS is_outlier
    FROM documents d JOIN m USING (source)
    """,
    tags=("stats", "analytics"),
)
def stat_outliers_zscore(spark, sf_dir):
    """Per-group z-score outlier flag (|z| > 3/2) with ZERO floating
    point: |x − μ| > (3/2)σ is squared and scaled by n² into
    4·(x·n − Σx)² > 9·(n·Σx² − (Σx)²) — pure int64 moment arithmetic,
    and the threshold stays an exact rational. (A 3σ cut never fires on
    near-uniform data — max |x − μ| is ~1.73σ — so 3/2 is the useful
    default here; any rational k just rescales the two integer sides.)
    Bit-exact in any engine and any reduction order — the same moment
    trick as stats.py's OLS/correlation.

    Shape: one grouped moment aggregation (|groups| rows) broadcast back
    onto the scan — no second shuffle. Overflow: (x·n)² caps x·n at
    ~3e9; for 100 TB groups promote moments to DECIMAL(38,0).
    """
    d = T(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
    )
    dev = F.col("n_chars") * F.col("n") - F.col("s1")
    return d.join(F.broadcast(m), "source").select(
        "doc_id",
        "source",
        "n_chars",
        (
            4 * dev * dev > 9 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        ).alias("is_outlier"),
    )


@query(
    "trend_gap_filled_hourly",
    sql="""
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    h AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
    c AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT h.hour, COALESCE(c.cnt, 0) AS cnt
    FROM h LEFT JOIN c ON c.hour = h.hour
    """,
    tags=("trend", "analytics"),
)
def trend_gap_filled_hourly(spark, sf_dir):
    """Gap-filled hourly series: every hour between the stream's first
    and last event appears, zero-filled where no 'purchase' occurred —
    the resample/asfreq step dashboards and forecasting features need
    (a missing hour and a zero hour are different facts).

    Shape: bounds are a 1-row min/max aggregate; the dense hour spine is
    a single sequence() explode of that row (span-sized, not data-sized);
    counts aggregate once and broadcast under the spine-preserving join.
    """
    e = T(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    counts = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("cnt"))
    )
    # Broadcast the aggregated counts (right side of the left join —
    # Spark cannot build-left a left-outer broadcast join); the
    # spine-preserving side streams.
    return (
        spine.join(F.broadcast(counts), "hour", "left")
        .select("hour", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )


@query(
    "quality_equidepth_histogram",
    sql="""
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS lo_chars,
           CAST(max(n_chars) AS BIGINT) AS hi_chars
    FROM (
      SELECT n_chars, ntile(10) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    )
    GROUP BY bucket
    """,
    tags=("quality", "histogram", "analytics"),
)
def quality_equidepth_histogram(spark, sf_dir):
    """Equi-depth (decile) length histogram: 10 buckets of equal row
    count with their value ranges — the skew-revealing complement of the
    fixed-width histogram. Tie-break by doc_id makes the decile
    assignment total and engine-identical.

    The global ntile window funnels rows through one task — exact-decile
    semantics require it. This is the oracle contract; at 100 TB the
    production path is approx_percentile bucket *bounds* (one pass,
    partial-aggregated) with this exact variant reserved for samples.
    """
    d = T(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        d.select("n_chars", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("lo_chars"),
            F.max("n_chars").alias("hi_chars"),
        )
    )


@query(
    "text_zipf_table",
    sql="""
    SELECT w AS word, c AS freq, rank FROM (
      SELECT w, c, CAST(row_number() OVER (ORDER BY c DESC, w) AS INTEGER) AS rank
      FROM (SELECT w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY w)
    ) WHERE rank <= 30
    """,
    tags=("text", "analytics"),
)
def text_zipf_table(spark, sf_dir):
    """Zipf rank-frequency table (top 30): the corpus-health fingerprint
    curation runs chart to spot vocabulary collapse or boilerplate
    flooding. Rank ties break lexicographically so the table is total.

    Shape: token explode → partial+final count (shuffle = |vocab|) →
    rank window over the vocabulary-sized aggregate (tiny by then).
    """
    ranked = (
        par(T(spark, sf_dir, "documents"))
        .select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word",
            "freq",
            F.row_number()
            .over(Window.orderBy(F.col("freq").desc(), "word"))
            .cast("int")
            .alias("rank"),
        )
    )
    return ranked.where(F.col("rank") <= 30)


@query(
    "funnel_conversion",
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
    tags=("analytics", "funnel"),
)
def funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel (view → click after the first view →
    purchase after that click): the strict-sequence semantics product
    analytics needs — a later-stage event BEFORE the earlier stage does
    not count, which a naive per-type count gets wrong.

    Shape: three per-user min aggregations, each joined to the previous
    stage on user_id — at scale all three shuffles share the user_id
    partitioning (one exchange reused), and stage outputs shrink
    monotonically. Final counts are 1-row aggregates.
    """
    e = T(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("tv")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.join(c, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") > F.col("tc")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


@query(
    "cohort_retention",
    sql="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT date_diff('day', DATE '2024-01-01', f.cohort_day) // 7 AS cohort_week,
           date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first_seen f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
    tags=("analytics", "cohort"),
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-seen week, then
    counted distinct in each week offset since their cohort — the
    retention-curve input. Week indexes are integer day arithmetic
    (datediff // 7 against a fixed epoch), not date_trunc('week'):
    engine-neutral and unambiguous about week starts.

    Shape: first-seen is one user-keyed aggregation joined back on
    user_id (co-partitioned with the event scan at scale); the retention
    matrix is a count-distinct over |cohorts| × |offsets| keys.
    """
    e = T(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    epoch = F.lit("2024-01-01").cast("date")
    return (
        e.join(f, "user_id")
        .groupBy(
            F.floor(F.datediff(F.col("cohort_day"), epoch) / 7).alias("cohort_week"),
            F.floor(F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7).alias(
                "week_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@query(
    "profile_documents",
    sql="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           min(CAST({c} AS VARCHAR)) AS min_str,
           max(CAST({c} AS VARCHAR)) AS max_str
    FROM documents
    """
        for c in _PROFILE_COLS
    ),
    tags=("analytics", "profiling"),
)
def profile_documents(spark, sf_dir):
    """Table profiler (ANALYZE-style): per-column row/null/distinct
    counts and lexicographic min/max — the data-quality report a
    pipeline emits on every new source drop. String min/max compare by
    codepoint in both engines (ASCII fixtures), so the profile is
    engine-exact.

    Shape: ONE aggregation pass computing all columns' stats, then a
    ``stack`` unpivot of the single result row. The table is scanned
    once — at 100 TB the scan dominates, so this beats the per-column
    union (kept as :func:`profile_documents_per_column`, pinned equal in
    pytest) by ~|cols|×. The multiple ``count(DISTINCT)``s plan as one
    scan + an Expand (|cols|-way row replication into partial aggs):
    more agg input than a per-column pass, but only one trip through
    storage, and still fully partial-aggregatable.
    """
    d = T(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"__nn_{c}"),
            F.count_distinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    one = d.agg(F.count("*").alias("__n"), *aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_str, max_str)",
        "__n AS n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def profile_documents_per_column(spark, sf_dir):
    """Per-column variant of :func:`profile_documents` (not registered):
    one aggregation per column over the shared scan, unioned. Trades
    |cols| scans for per-column pruning and no Expand replication —
    preferable when only a narrow column subset is profiled on a wide
    table. Output contract is identical (pinned in pytest)."""
    d = T(spark, sf_dir, "documents")
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            d.agg(
                F.count("*").alias("n_rows"),
                (F.count("*") - F.count(c)).alias("n_nulls"),
                F.count_distinct(c).alias("n_distinct"),
                F.min(F.col(c).cast("string")).alias("min_str"),
                F.max(F.col(c).cast("string")).alias("max_str"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "trend_rolling_7d_users",
    sql="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    e AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events)
    SELECT days.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau
    FROM days JOIN e ON e.d BETWEEN days.day - 6 AND days.day
    GROUP BY days.day
    """,
    tags=("trend", "analytics"),
)
def trend_rolling_7d_users(spark, sf_dir):
    """Trailing-7-day distinct active users per day (rolling WAU) —
    count distinct does NOT decompose over a sliding frame, so the
    window-function route is unavailable; the correct shape is a
    day-spine range join over the deduplicated (day, user) set.

    Scale: (day, user) dedup shrinks the fact side first (shuffle =
    |active pairs|, not |events|); the day spine is tiny and broadcasts,
    so the range join is a broadcast nested-loop over ≤7-day matches.
    Approximate twin at extreme scale: per-day HLL sketches merged over
    the trailing window.
    """
    e = T(spark, sf_dir, "events")
    days = e.select(F.to_date("ts").alias("day")).distinct()
    pairs = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    return (
        pairs.join(
            F.broadcast(days),
            (F.col("d") >= F.date_sub(F.col("day"), 6)) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "dedup_events_hourly",
    sql="""
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             row_number() OVER (
               PARTITION BY user_id, event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    tags=("dedup", "events", "analytics"),
)
def dedup_events_hourly(spark, sf_dir):
    """Batch event dedup: keep the first (user, event_type) occurrence
    per clock hour — the at-least-once-delivery cleanup every event
    pipeline runs before metrics (its streaming twin is
    ``dropDuplicatesWithinWatermark`` in streaming/dedup.py). ts is
    tie-broken by event_id so "first" is total.

    Shape: one window shuffle keyed by (user, type, hour) — high
    cardinality, skew-free; at 100 TB the hour bucket keeps any single
    partition's state to one user-type-hour of events.
    """
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    return (
        T(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "trend_rolling_7d_users_approx",
    sql="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    e AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events)
    SELECT days.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau_exact,
           TRUE AS approx_ok
    FROM days JOIN e ON e.d BETWEEN days.day - 6 AND days.day
    GROUP BY days.day
    """,
    tags=("trend", "analytics", "approx"),
)
def trend_rolling_7d_users_approx(spark, sf_dir):
    """Sketch-merge twin of trend_rolling_7d_users: one HLL sketch per
    day (|days| rows of state, each a few KB), then the trailing window
    is a UNION of 7 sketches — mergeability is the property exact
    count-distinct lacks, and is what makes rolling uniques tractable
    when the per-window user set no longer fits a shuffle. Same
    day-spine broadcast range join as the exact twin.

    Driver-checked tolerance PIN (the sketch estimate is
    engine-specific): each day emits the exact WAU plus ``approx_ok`` =
    |sketch − exact| ≤ 3·rsd·exact (lgConfigK=12 → rsd ≈ 1.6%); the
    oracle recomputes the exact WAU and asserts TRUE, so a hash match
    verifies the rolling cardinalities AND the per-day sketch error
    contract.
    """
    rsd = 0.016
    e = T(spark, sf_dir, "events")
    sketches = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    days = e.select(F.to_date("ts").alias("day")).distinct()
    rng = (F.col("d") >= F.date_sub(F.col("day"), 6)) & (F.col("d") <= F.col("day"))
    approx = (
        sketches.join(F.broadcast(days), rng)
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_approx"))
    )
    exact = (
        e.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .join(F.broadcast(days), rng)
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau_exact"))
    )
    tol = F.ceil(F.lit(3 * rsd) * F.col("wau_exact"))
    return exact.join(approx, "day").select(
        "day",
        "wau_exact",
        (F.abs(F.col("wau_approx") - F.col("wau_exact")) <= tol).alias("approx_ok"),
    )


@query(
    "trend_anomaly_days",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_events) AS BIGINT) AS s1,
             CAST(sum(n_events * n_events) AS BIGINT) AS s2
      FROM daily
    )
    SELECT day, n_events,
           4 * (n_events * m.n - m.s1) * (n_events * m.n - m.s1)
             > 9 * (m.n * m.s2 - m.s1 * m.s1) AS is_anomaly
    FROM daily, m
    """,
    tags=("trend", "anomaly"),
)
def trend_anomaly_days(spark, sf_dir):
    """Time-series anomaly flags on the daily event volume — the traffic
    monitor a pipeline runs over its own ingest: a day whose count
    deviates from the corpus mean by more than 3/2·σ is flagged
    (crawler outage, bot flood, duplicated feed).

    Same zero-float moment trick as `stat_outliers_zscore`, applied to
    the time axis: one daily aggregation (partial map-side), a 1-row
    moment summary broadcast back over it, and an integer inequality —
    bit-exact in any engine and reduction order. Daily-count rows are
    |days| regardless of corpus size, so everything after the first
    aggregation is driver-trivial at 100 TB.
    """
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    m = daily.agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    dev = F.col("n_events") * F.col("n") - F.col("s1")
    return daily.crossJoin(F.broadcast(m)).select(
        "day",
        "n_events",
        (
            4 * dev * dev > 9 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        ).alias("is_anomaly"),
    )


_TRANSITIONS_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    pair AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p_next
    FROM pair
    """


@query("analytics_event_transitions", sql=_TRANSITIONS_SQL, tags=("analytics", "events"))
def analytics_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: for each (from_type, to_type), the transition count and
    conditional probability P(next | current) — the model behind
    next-action prediction, funnel-drop attribution, and bot detection
    (bots have near-deterministic transition rows).

    Shape: one window (lead over user sessions — partition by user_id,
    order by (ts, event_id) so same-timestamp events have a stable
    order), one pair-count agg, one per-from_type normalization window
    over the TINY |types|^2 matrix. The only corpus-sized shuffle is
    the user partition; probability = int/int division, exact both
    engines.
    """
    seq = (
        par(T(spark, sf_dir, "events"))
        .select(
            "user_id",
            "event_type",
            F.lead("event_type")
            .over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            )
            .alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
    )
    pair = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("from_type")
    return pair.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("p_next"),
    )


_RFM_SQL = """
    WITH agg AS (
      SELECT user_id,
             epoch_us(max(ts)) AS last_us,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                  AS BIGINT) AS monetary_cents
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT user_id, frequency, monetary_cents,
             row_number() OVER (ORDER BY last_us, user_id) AS r_rn,
             row_number() OVER (ORDER BY frequency, user_id) AS f_rn,
             row_number() OVER (ORDER BY monetary_cents, user_id) AS m_rn,
             count(*) OVER () AS n
      FROM agg
    )
    SELECT user_id, frequency, monetary_cents,
           CAST((r_rn - 1) * 4 // n + 1 AS INTEGER) AS recency_q,
           CAST((f_rn - 1) * 4 // n + 1 AS INTEGER) AS frequency_q,
           CAST((m_rn - 1) * 4 // n + 1 AS INTEGER) AS monetary_q
    FROM r
    """


@query("analytics_rfm_segments", sql=_RFM_SQL, tags=("analytics", "events"))
def analytics_rfm_segments(spark, sf_dir):
    """RFM user segmentation: per-user recency (last event time),
    frequency (event count), monetary (value sum), each bucketed into
    deterministic quartiles — the classic marketing/product
    segmentation grid.

    Determinism contract (this query went driver-red in r4–r6 with an
    all-integer output that matched locally, so every engine-version-
    sensitive construct is eliminated): NO ntile — its remainder-
    distribution rule is an engine implementation detail — quartiles
    are spelled as `(row_number − 1) * 4 DIV n + 1` over the total
    order (metric, user_id), pure int64 arithmetic with truncating
    division on positive operands, bit-identical on any engine; NO
    direct timestamp comparisons — recency orders by epoch
    MICROSECONDS as BIGINT (unix_micros ↔ epoch_us); monetary rides
    the repo-canonical `fxp` idiom (round(value*100) → BIGINT, exact:
    events.value is a true 2-decimal column, so value*100 is never
    near a .5 boundary) and sums as exact int64.

    Shape: one partial+final agg keyed on user_id, then three window
    passes over the |users| aggregate (corpus-size-independent — users,
    not events). At 100 TB the global sorts run on the small per-user
    table; if users themselves are huge, swap row_number for
    percent-rank thresholds on the same ordering.
    """
    e = par(T(spark, sf_dir, "events"))
    agg = e.groupBy("user_id").agg(
        F.expr(
            # ts is TIMESTAMP_NTZ: diff from a fixed NTZ epoch gives
            # micros with NO session-timezone shift (a cast to TIMESTAMP
            # would apply the session zone and is not order-safe across
            # DST fall-back); DuckDB's epoch_us is the same naive diff
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', max(ts))"
        ).alias("last_us"),
        F.count("*").alias("frequency"),
        F.coalesce(F.sum(fxp("value")), F.lit(0).cast("long")).alias(
            "monetary_cents"
        ),
    )
    rn = lambda col: F.row_number().over(Window.orderBy(col, "user_id"))  # noqa: E731
    ranked = agg.select(
        "user_id",
        "frequency",
        "monetary_cents",
        rn("last_us").alias("r_rn"),
        rn("frequency").alias("f_rn"),
        rn("monetary_cents").alias("m_rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    quart = lambda c: F.expr(f"CAST(({c} - 1) * 4 DIV n + 1 AS INT)")  # noqa: E731
    return ranked.select(
        "user_id",
        "frequency",
        "monetary_cents",
        quart("r_rn").alias("recency_q"),
        quart("f_rn").alias("frequency_q"),
        quart("m_rn").alias("monetary_q"),
    )


_PATHS_SQL = """
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path LIMIT 20
    """


@query("analytics_user_paths_topk", sql=_PATHS_SQL, tags=("analytics", "events"))
def analytics_user_paths_topk(spark, sf_dir):
    """Top-20 three-step user paths (event-type trigrams over per-user
    time-ordered sequences) — the order-2 companion of the transition
    matrix: where `analytics_event_transitions` models one step, this
    surfaces the full journeys product teams read ("view > view >
    purchase" vs "view > view > view").

    Shape: ONE user-window pass computes both leads (same partition +
    ordering, so Spark plans a single Window node), then a path-keyed
    partial+final count and a top-20 TakeOrderedAndProject. The
    (ts, event_id) ordering makes same-timestamp sequences stable
    cross-engine.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        par(T(spark, sf_dir, "events"))
        .select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e3").isNotNull())
    )
    return (
        seq.select(F.concat_ws(" > ", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


_GAP_BIN_US = 600_000_000  # 10-minute histogram bins

_GAPS_SQL = f"""
    WITH g AS (
      SELECT date_diff('us', lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id), ts) AS gap_us
      FROM events
    )
    SELECT CAST(gap_us // {_GAP_BIN_US} AS BIGINT) AS bin,
           CAST(gap_us // {_GAP_BIN_US} AS BIGINT) * {_GAP_BIN_US} AS bin_lo_us,
           CAST(count(*) AS BIGINT) AS n_gaps
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY 1, 2
    """


@query("analytics_event_gaps_histogram", sql=_GAPS_SQL, tags=("analytics", "events"))
def analytics_event_gaps_histogram(spark, sf_dir):
    """Histogram of per-user inter-event gaps in 10-minute bins — the
    distribution that JUSTIFIES a sessionization gap threshold (the
    30-minute convention should sit in the valley between within-
    session and between-session modes; this query shows whether it
    does for a given corpus). Gaps in exact integer microseconds;
    bins by integer floor-division, so both engines bucket
    identically with zero float arithmetic.

    Shape: one user-window lag over the events scan, then a
    partial+final count keyed on the bin — |bins| output rows.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
    )
    g = (
        par(T(spark, sf_dir, "events"))
        .select(gap.alias("gap_us"))
        .where(F.col("gap_us").isNotNull())
    )
    bin_col = F.floor(F.col("gap_us") / F.lit(_GAP_BIN_US)).cast("long")
    return (
        g.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_gaps"))
        .select(
            "bin",
            (F.col("bin") * _GAP_BIN_US).alias("bin_lo_us"),
            "n_gaps",
        )
    )


_EWMA_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    packed AS (
      SELECT list(day ORDER BY day) AS days,
             list(CAST(n_events AS DOUBLE) ORDER BY day) AS c,
             list(n_events ORDER BY day) AS cn
      FROM daily
    ),
    sm AS (
      SELECT days, cn,
             list_transform(range(1, len(c) + 1),
               t -> list_reduce(c[1:CAST(t AS INT)],
                    (acc, x) -> CAST(0.3 AS DOUBLE) * x
                              + CAST(0.7 AS DOUBLE) * acc)) AS s
      FROM packed
    ),
    rws AS (
      SELECT unnest(list_transform(range(1, len(days) + 1),
               t -> struct_pack(
                 day := days[CAST(t AS INT)],
                 n_events := cn[CAST(t AS INT)],
                 ewma := s[CAST(t AS INT)],
                 is_spike := t >= 2 AND CAST(cn[CAST(t AS INT)] AS DOUBLE)
                   > CAST(2.0 AS DOUBLE) * s[CAST(t AS INT) - 1]))) AS r
      FROM sm
    )
    SELECT r.day AS day, r.n_events AS n_events,
           r.ewma AS ewma, r.is_spike AS is_spike
    FROM rws
    """


@query("trend_ewma_spikes", sql=_EWMA_SQL, tags=("trend", "anomaly"))
def trend_ewma_spikes(spark, sf_dir, alpha: float = 0.3):
    """EWMA-smoothed daily event volume with spike flags — the
    level-shift-tolerant sibling of `trend_anomaly_days` (a global
    z-score flags every day of a ramp; an exponentially-weighted
    moving average adapts, so only days jumping >2x ABOVE their own
    recent level fire). s_1 = c_1; s_t = α·c_t + (1−α)·s_{t−1}.

    Scale shape: one partial+final daily aggregation (|days| rows out
    of any corpus size), then the recurrence runs on a SINGLE packed
    row: sort_array(collect_list) → per-t left folds (O(|days|²) ≈ 900
    scalar ops — driver-trivial, no window, no second shuffle).

    Determinism: the fold multiplies/adds doubles in the same order in
    both engines (DuckDB's list_reduce over c[1:t] ≡ Spark's aggregate
    over slice 2..t seeded with c_1), with α cast to DOUBLE on both
    sides — bit-exact ewma values in the output hash.
    """
    a, b = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "n_events"))).alias("sd")
    ).select(
        F.transform("sd", lambda r: r.getField("day")).alias("days"),
        F.transform("sd", lambda r: r.getField("n_events").cast("double")).alias("c"),
        F.transform("sd", lambda r: r.getField("n_events")).alias("cn"),
    )
    sm = packed.select(
        "days",
        "cn",
        F.transform(
            F.sequence(F.lit(1), F.size("c")),
            lambda t: F.aggregate(
                F.slice("c", F.lit(2), t - 1),
                F.element_at("c", F.lit(1)),
                lambda acc, x: a * x + b * acc,
            ),
        ).alias("s"),
    )
    t = F.col("t")
    return (
        sm.select(
            F.posexplode(F.sequence(F.lit(1), F.size("days"))).alias("_i", "t"),
            "days",
            "cn",
            "s",
        )
        .select(
            F.element_at("days", t).alias("day"),
            F.element_at("cn", t).alias("n_events"),
            F.element_at("s", t).alias("ewma"),
            (
                (t >= 2)
                & (
                    F.element_at("cn", t).cast("double")
                    > F.lit(2.0) * F.element_at("s", t - 1)
                )
            ).alias("is_spike"),
        )
    )


_CONCURRENCY_SQL = """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 1 DAY THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ),
    sess AS (
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
      FROM s GROUP BY user_id, sid
    ),
    points AS (
      SELECT user_id, session_start AS ts, 1 AS delta FROM sess
      UNION ALL
      SELECT user_id, session_end AS ts, -1 AS delta FROM sess
    ),
    swept AS (
      SELECT user_id, ts, delta,
             CAST(sum(delta) OVER (ORDER BY ts, delta DESC, user_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrency
      FROM points
    )
    SELECT user_id, ts AS session_start, concurrency
    FROM swept WHERE delta = 1
    """


@query(
    "analytics_concurrent_sessions",
    sql=_CONCURRENCY_SQL,
    tags=("analytics", "session", "sweep"),
)
def analytics_concurrent_sessions(spark, sf_dir):
    """Per-session concurrency: how many sessions (its own included,
    and sessions ending exactly then — end >= start is active) are
    open at each session's start — the load-curve measurement behind
    capacity planning and "peak concurrent users" reporting.

    The naive formulation is an interval self-join (start <= t <= end:
    a BroadcastNestedLoopJoin, O(n²)); the classic fix is a sweep:
    +1/−1 points and a running sum in one total order. A single global
    window would serialize onto one partition, so this runs the sweep
    DISTRIBUTED, two-level: per-day-bucket partial sums are collected
    (|days| numbers — index metadata), exclusive prefix offsets are
    broadcast-joined back, and the within-bucket running sum is a
    window PARTITIONED BY bucket — every bucket sweeps in parallel and
    integer addition makes the two-level composition exactly the
    global cumsum. Tie order (ts, delta DESC, user_id) is total (a
    user's sessions are gap-separated) and processes starts before
    ends at the same instant, keeping just-ending sessions counted.
    """
    e = T(spark, sf_dir, "events")
    sess = (
        e.groupBy(F.session_window("ts", "1 day").alias("w"), "user_id")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"))
        .select("user_id", "session_start", "session_end")
    )
    points = sess.select(
        "user_id", F.col("session_start").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            "user_id", F.col("session_end").alias("ts"), F.lit(-1).alias("delta")
        )
    ).withColumn("bucket", F.to_date("ts"))
    bsums = {
        r["bucket"]: r["s"]
        for r in points.groupBy("bucket").agg(F.sum("delta").alias("s")).collect()
    }
    off, acc = {}, 0
    for b in sorted(bsums):
        off[b] = acc
        acc += bsums[b]
    offsets = points.sparkSession.createDataFrame(
        list(off.items()), "bucket date, offset long"
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("ts", F.desc("delta"), "user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        points.join(F.broadcast(offsets), "bucket")
        .select(
            "user_id",
            "ts",
            "delta",
            (F.sum("delta").over(w) + F.col("offset")).alias("concurrency"),
        )
        .where(F.col("delta") == 1)
        .select("user_id", F.col("ts").alias("session_start"), "concurrency")
    )


_DEBOUNCE_SQL = """
    WITH d AS (
      SELECT event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS prev_us
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(*) FILTER (WHERE prev_us IS NULL
                                    OR us - prev_us > 5000000) AS BIGINT) AS n_kept
    FROM d
    GROUP BY event_type
    """


@query("dedup_events_debounce", sql=_DEBOUNCE_SQL, tags=("dedup", "events"))
def dedup_events_debounce(spark, sf_dir):
    """Debounce dedup: an event repeated by the same user within 5s of
    the previous same-type event is a client retry / double-submit, not
    a signal — per type, raw vs debounced counts (the cleaning rule
    itself is the filter `prev IS NULL OR gap > 5s`). Complements
    `dedup_events_hourly` (which keys on the hour bucket): debounce is
    order-sensitive, so it needs the lag window, one shuffle keyed on
    (user, type) — per-user-type partitions stay small at any corpus
    size. Gap arithmetic in exact integer microseconds.
    """
    e = T(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (UTC session makes
    # the cast an identity on instants, matching DuckDB's epoch_us)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    d = e.select("event_type", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
    kept = F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > 5_000_000)
    return d.groupBy("event_type").agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(kept, 1)).alias("n_kept"),
    )


_PARETO_SQL = """
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    r AS (
      SELECT n,
             CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rk,
             CAST(sum(n) OVER (ORDER BY n DESC, user_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(count(*) OVER () AS BIGINT) AS n_users,
             CAST(sum(n) OVER () AS BIGINT) AS total
      FROM u
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(max(cum) AS BIGINT) AS cum_events,
           CAST(max(cum) AS DOUBLE) / any_value(total) AS cum_share
    FROM (SELECT *, (rk * 10 - 1) // n_users + 1 AS decile FROM r)
    GROUP BY decile
    """


@query("analytics_power_users_pareto", sql=_PARETO_SQL, tags=("analytics", "events"))
def analytics_power_users_pareto(spark, sf_dir):
    """Pareto concentration curve: users ranked by activity, bucketed
    into deciles, with the cumulative event share at each decile
    boundary — the "do 10% of users drive 80% of events" measurement
    behind skew-aware capacity and sampling decisions (and a direct
    read on how salted paths will pay off).

    Integer end to end until one final division: per-user counts, a
    deterministic (n DESC, user_id) rank, integer cumulative sums, and
    decile = ceil(rk*10 / n_users) in pure integer math. The global
    window runs over |users| rows (already aggregated), not events —
    at 100 TB that's the same two-level sweep as
    `analytics_concurrent_sessions` if |users| ever outgrows one
    partition.
    """
    e = T(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.count("*").alias("n"))
    w_rank = Window.orderBy(F.desc("n"), "user_id")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    r = u.select(
        "n",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.sum("n").over(w_cum).alias("cum"),
        F.count("*").over(w_all).alias("n_users"),
        F.sum("n").over(w_all).alias("total"),
    )
    decile = ((F.col("rk") * 10 - 1) / F.col("n_users")).cast("long") + 1
    return (
        r.select(decile.cast("int").alias("decile"), "cum", "total")
        .groupBy("decile")
        .agg(
            F.max("cum").alias("cum_events"),
            (F.max("cum").cast("double") / F.first("total")).alias("cum_share"),
        )
    )


_TV_SQL = """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    sc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c_s FROM tok GROUP BY source, w
    ),
    corp AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
    totals AS (
      SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM sc GROUP BY source
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
    grid AS (
      SELECT t.source, t.n_s, corp.w, corp.c, coalesce(sc.c_s, 0) AS c_s
      FROM totals t
      CROSS JOIN corp
      LEFT JOIN sc ON sc.source = t.source AND sc.w = corp.w
    )
    SELECT source,
           CAST(sum(abs(c_s * n.n - c * n_s)) AS BIGINT) AS tv_numer,
           CAST(sum(abs(c_s * n.n - c * n_s)) AS DOUBLE)
             / (2.0 * any_value(n_s) * any_value(n.n)) AS tv_distance
    FROM grid, n
    GROUP BY source
    """


@query("stat_tv_distance_sources", sql=_TV_SQL, tags=("stats", "drift", "text"))
def stat_tv_distance_sources(spark, sf_dir):
    """Per-source distribution drift vs the corpus: total-variation
    distance between each source's unigram distribution and the
    whole-corpus distribution — the KL/JS-divergence job done log-free
    (TV = half the L1 gap, orders sources by drift the same way, and is
    the metric behind "did this crawl snapshot shift?" monitors).

    Exactness: TV = Σ_w |c_s·N − c·n_s| / (2·n_s·N) — the numerator is
    a pure int64 sum (order-independent), the division a single IEEE
    op, so the result is bit-identical across engines. Overflow: c·n_s
    caps corpus tokens at ~3e9; past that promote to DECIMAL(38,0).
    Shape: two count aggregations, then a vocab × sources grid (a
    broadcast of the tiny source-totals side over the vocab table) —
    shuffle volume |vocab|·|sources|, not corpus-sized.
    """
    d = T(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    sc = tok.groupBy("source", "w").agg(F.count("*").alias("c_s"))
    corp = tok.groupBy("w").agg(F.count("*").alias("c"))
    totals = sc.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    n = tok.agg(F.count("*").alias("n"))
    grid = (
        corp.crossJoin(F.broadcast(totals))
        .join(sc, ["source", "w"], "left")
        .select(
            "source", "n_s", "w", "c", F.coalesce("c_s", F.lit(0)).alias("c_s")
        )
        .crossJoin(F.broadcast(n))
    )
    numer = F.sum(F.abs(F.col("c_s") * F.col("n") - F.col("c") * F.col("n_s")))
    return grid.groupBy("source").agg(
        numer.alias("tv_numer"),
        (
            numer.cast("double") / (2.0 * F.first("n_s") * F.first("n"))
        ).alias("tv_distance"),
    )


_MB_MINSUP = 3  # minimum co-occurrence support (orders)
_MB_MAX_BASKET = 16  # basket-size cap: bounds the quadratic pair fan-out


@query(
    "analytics_market_basket",
    sql=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    ok AS (
      SELECT l_orderkey FROM items GROUP BY l_orderkey
      HAVING count(*) <= {_MB_MAX_BASKET}
    ),
    it AS (SELECT i.* FROM items i JOIN ok USING (l_orderkey)),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM it),
    c AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM it GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(count(*) AS BIGINT) AS support
      FROM it a JOIN it b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_MB_MINSUP}
    )
    SELECT p.p1, p.p2, p.support,
           CAST((1000 * p.support) // c1.c AS BIGINT) AS conf_permille,
           CAST(p.support * n.n_baskets AS DOUBLE) / (c1.c * c2.c) AS lift
    FROM pairs p
    JOIN c c1 ON c1.l_partkey = p.p1
    JOIN c c2 ON c2.l_partkey = p.p2
    CROSS JOIN n
    """,
    tags=("analytics", "market-basket"),
)
def analytics_market_basket(spark, sf_dir):
    """Market-basket association rules: part pairs co-purchased in the
    same order, with support, confidence (permille, integer), and lift
    — the co-occurrence/recommendation primitive (frequent itemsets of
    size 2, the workhorse case).

    Scale contract: the pair fan-out is quadratic in basket size, so
    baskets above 16 distinct items are excluded up front (documented
    false-negative mode — outlier mega-baskets are noise for
    association mining; the cap bounds the self-join at
    O(baskets·cap²)). The self-join is keyed on the order (co-located
    pairs, no cartesian); item frequencies are part-dimension-sized and
    broadcast; `lift` is a single IEEE division of exact int64 products
    (< 2^53, exactly representable both engines).
    """
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = li.distinct().localCheckpoint(eager=False)
    ok = (
        items.groupBy("l_orderkey")
        .agg(F.count("*").alias("sz"))
        .where(F.col("sz") <= _MB_MAX_BASKET)
        .select("l_orderkey")
    )
    it = items.join(ok, "l_orderkey").localCheckpoint(eager=False)
    n = it.agg(F.count_distinct("l_orderkey").cast("long").alias("n_baskets"))
    c = it.groupBy("l_partkey").agg(F.count("*").cast("long").alias("c"))
    a, b = it.alias("a"), it.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= _MB_MINSUP)
    )
    c1 = c.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    c2 = c.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    return (
        pairs.join(F.broadcast(c1), "p1")
        .join(F.broadcast(c2), "p2")
        .join(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "support",
            F.expr("(1000 * support) div c1").cast("long").alias("conf_permille"),
            (
                (F.col("support") * F.col("n_baskets")).cast("double")
                / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
    )


_ATTR_WINDOW_US = 3_600_000_000  # 1h attribution lookback, microseconds


@query(
    "analytics_attribution_last_touch",
    sql=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us
      FROM events
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts_us AS p_ts
      FROM ev WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT event_id AS touch_id, user_id, event_type AS touch_type,
             ts_us AS t_ts
      FROM ev WHERE event_type IN ('click', 'view')
    ),
    joined AS (
      SELECT p.purchase_id, p.user_id, t.touch_id, t.touch_type,
             p.p_ts - t.t_ts AS gap_us,
             row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY t.t_ts DESC, t.touch_id DESC
             ) AS rn
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - {_ATTR_WINDOW_US}
    )
    SELECT p.purchase_id, p.user_id,
           j.touch_id AS attributed_event_id,
           j.touch_type AS attributed_type,
           CAST(j.gap_us AS BIGINT) AS gap_us
    FROM purchases p
    LEFT JOIN (SELECT * FROM joined WHERE rn = 1) j USING (purchase_id)
    """,
    tags=("analytics", "attribution"),
)
def analytics_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the user's
    most recent click/view in the preceding hour (NULL row kept when no
    touch qualifies — unattributed conversions are a first-class
    metric). The marketing/product-analytics primitive behind
    conversion reporting.

    Deterministic winner: ties on touch timestamp break by event_id,
    both inside a rank-1 window per purchase — integer microsecond
    arithmetic everywhere. Scale shape: the touch⋈purchase range join
    keys on user_id (co-partitioned shuffle; per-user event streams are
    small), the window partitions by purchase — no global sort, no
    cartesian. The 1h bound keeps per-purchase candidate sets O(user
    activity per hour) regardless of history length.
    """
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        # ts may surface as TIMESTAMP_NTZ (nanos parquet path); the session
        # is UTC-pinned, so the LTZ cast is a no-op on the instant.
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts_us").alias("p_ts")
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch_type"),
        F.col("ts_us").alias("t_ts"),
    )
    joined = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - _ATTR_WINDOW_US),
    ).select(
        "purchase_id",
        "touch_id",
        "touch_type",
        (F.col("p_ts") - F.col("t_ts")).alias("gap_us"),
        F.row_number()
        .over(
            Window.partitionBy("purchase_id").orderBy(
                F.col("t_ts").desc(), F.col("touch_id").desc()
            )
        )
        .alias("rn"),
    )
    best = joined.where(F.col("rn") == 1).select(
        "purchase_id",
        F.col("touch_id").alias("attributed_event_id"),
        F.col("touch_type").alias("attributed_type"),
        F.col("gap_us").cast("long").alias("gap_us"),
    )
    return purchases.select("purchase_id", "user_id").join(
        best, "purchase_id", "left"
    )


@query(
    "analytics_time_to_convert",
    sql="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    first_signup AS (
      SELECT user_id, CAST(min(ts_us) AS BIGINT) AS s_ts
      FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase AS (
      SELECT e.user_id, CAST(min(e.ts_us) AS BIGINT) AS p_ts
      FROM ev e JOIN first_signup s
        ON e.user_id = s.user_id AND e.ts_us >= s.s_ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT CAST((p.p_ts - s.s_ts) // 3600000000 AS BIGINT) AS hours_bucket,
           CAST(count(*) AS BIGINT) AS n_users
    FROM first_signup s JOIN first_purchase p USING (user_id)
    GROUP BY 1
    """,
    tags=("analytics", "funnel"),
)
def analytics_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution: hours between a user's first
    signup and their first purchase AT OR AFTER it, bucketed into an
    integer-hour histogram — the activation-latency curve growth teams
    read next to the funnel rate (how fast conversions happen, not just
    whether). Purchases before the signup (out-of-order or legacy
    users) are excluded by the ``>= s_ts`` bound, not silently given
    negative buckets.

    Integer microsecond arithmetic with integral-division bucketing —
    no floats. Shape: two per-user min-aggregations (map-side
    combinable, keyed by user) and a users-sized join; the histogram
    is a buckets-sized final aggregate.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").cast("long").alias("s_ts"))
    )
    purchase = (
        ev.where(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .where(F.col("ts_us") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").cast("long").alias("p_ts"))
    )
    return (
        signup.join(purchase, "user_id")
        .select(
            F.expr("(p_ts - s_ts) div 3600000000").cast("long").alias("hours_bucket")
        )
        .groupBy("hours_bucket")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@query(
    "analytics_stickiness_dau_wau",
    sql="""
    WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    dau AS (
      SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM e GROUP BY d
    ),
    wau AS (
      SELECT dau.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau
      FROM dau JOIN e ON e.d BETWEEN dau.day - 6 AND dau.day
      GROUP BY dau.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           CAST((1000 * dau.dau) // wau.wau AS BIGINT) AS stickiness_permille
    FROM dau JOIN wau USING (day)
    """,
    tags=("trend", "analytics"),
)
def analytics_stickiness_dau_wau(spark, sf_dir):
    """DAU/WAU stickiness per day (integer permille) — the engagement
    ratio product teams track: 1000 = every weekly user shows up daily,
    ~143 = users touch the product once a week. Composes the
    `trend_rolling_7d_users` range-join WAU with a per-day distinct
    DAU; the ratio is integral, so no float forms.

    Scale shape inherited from the WAU op: (day, user) dedup shrinks
    the fact table first, the day spine broadcasts, and both final
    frames are days-sized.
    """
    e = (
        T(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    dau = e.groupBy(F.col("d").alias("day")).agg(
        F.count("*").cast("long").alias("dau")
    )
    wau = (
        dau.select("day")
        .join(
            e,
            (F.col("d") >= F.date_sub(F.col("day"), 6))
            & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(1000 * dau) div wau").cast("long").alias("stickiness_permille"),
        )
    )


_RESURRECT_GAP_DAYS = 7


@query(
    "analytics_growth_accounting",
    sql=f"""
    WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    l AS (
      SELECT user_id, d,
             lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM e
    ),
    c AS (
      SELECT d AS day,
             CASE
               WHEN prev_d IS NULL THEN 'new'
               WHEN d - prev_d <= {_RESURRECT_GAP_DAYS} THEN 'retained'
               ELSE 'resurrected'
             END AS status
      FROM l
    )
    SELECT day, status, CAST(count(*) AS BIGINT) AS n_users
    FROM c GROUP BY day, status
    """,
    tags=("analytics", "growth"),
)
def analytics_growth_accounting(spark, sf_dir):
    """Growth accounting: every active (user, day) classified as NEW
    (first-ever activity), RETAINED (last active ≤ 7 days ago), or
    RESURRECTED (returned after a 7+ day gap) — the decomposition that
    turns a flat DAU line into a growth story (is DAU new acquisition
    or resurrection masking churn?). Churn is the complement (active in
    a trailing window, absent today) and reads off the same frame.

    One lag() window over the dedup-shrunk (user, day) set — per-user
    partitions, tiny rows; the classification is integer date
    arithmetic, the rollup a days×3 aggregate. No joins at all.
    """
    e = (
        T(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    l = e.select("user_id", "d", F.lag("d").over(w).alias("prev_d"))
    status = (
        F.when(F.col("prev_d").isNull(), "new")
        .when(
            F.datediff(F.col("d"), F.col("prev_d")) <= _RESURRECT_GAP_DAYS,
            "retained",
        )
        .otherwise("resurrected")
    )
    return (
        l.select(F.col("d").alias("day"), status.alias("status"))
        .groupBy("day", "status")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@query(
    "analytics_activity_bitmap",
    sql="""
    WITH a AS (
      SELECT user_id,
             bit_or(CAST(1 AS BIGINT) <<
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)) AS bm
      FROM events
      WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 0 AND 62
      GROUP BY user_id
    )
    SELECT CAST(bit_count(bm) AS INTEGER) AS active_days,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE (bm & 127) <> 0 AND (bm & 16256) <> 0)
                AS BIGINT) AS n_both_weeks
    FROM a GROUP BY 1
    """,
    tags=("analytics", "bitmap"),
)
def analytics_activity_bitmap(spark, sf_dir):
    """Per-user activity as a 64-day int64 BITMAP (bit i = active on day
    i of the window), rolled up to the active-day distribution plus a
    mask-intersection retention count (active in BOTH week 1 and week
    2). The bitmap-index idiom: once each user is 8 bytes, every
    engagement question — streaks, retention, overlap of arbitrary day
    sets — is bitwise AND/OR + popcount, no re-scan of raw events.

    Scale shape: ``bit_or`` is a map-side-combinable aggregate, so the
    raw fact table collapses to one int64 per user in a single shuffle;
    the histogram is a second users→63-row aggregate. The window is 63
    days (bits 0-62): bit 63 is excluded because ``1 << 63`` is the
    int64 sign bit — Spark's shiftleft wraps silently while DuckDB
    raises an overflow, so using it would both flip sign semantics and
    diverge the engines. Longer horizons shard the window into an array
    of words (one per 63 days) with the same algebra; days outside the
    window are filtered, not wrapped.
    """
    dd = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    bm = (
        T(spark, sf_dir, "events")
        .select("user_id", dd.alias("dd"))
        .where((F.col("dd") >= 0) & (F.col("dd") <= 62))
        .groupBy("user_id")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), dd))").alias("bm"))
    )
    both = (F.expr("bm & 127") != 0) & (F.expr("bm & 16256") != 0)
    return (
        bm.groupBy(F.bit_count("bm").cast("int").alias("active_days"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(both.cast("long")).cast("long").alias("n_both_weeks"),
        )
    )


@query(
    "analytics_funnel_windowed",
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv
        AND e.ts <= v.tv + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc
        AND e.ts <= c.tc + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_24h,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_24h
    """,
    tags=("analytics", "funnel"),
)
def analytics_funnel_windowed(spark, sf_dir):
    """Time-bounded funnel: click within 24 h of the first view,
    purchase within 24 h of that click. The unbounded funnel
    (`funnel_conversion`) answers "ever converted"; the windowed one
    answers the campaign/attribution question "converted BECAUSE OF" —
    conversion-rate SLAs are always stated with a window, and the two
    counts can differ wildly on long-lived users.

    Same three user-keyed min-aggregations as the unbounded funnel
    (shared user_id partitioning, monotonically shrinking stages); the
    window bound is a per-row predicate, free at any scale. Interval
    arithmetic stays in timestamp space — no epoch rounding drift
    between engines.
    """
    e = T(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.join(v, "user_id")
        .where(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("tv"))
            & (F.col("ts") <= F.col("tv") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("tc"))
            & (F.col("ts") <= F.col("tc") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.agg(F.count("*").cast("long").alias("n_view"))
        .crossJoin(c.agg(F.count("*").cast("long").alias("n_click_24h")))
        .crossJoin(p.agg(F.count("*").cast("long").alias("n_purchase_24h")))
    )


@query(
    "trend_anomaly_mad",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT day, n_events,
             row_number() OVER (ORDER BY n_events, day) AS rn,
             count(*) OVER () AS n
      FROM daily
    ),
    med AS (
      SELECT max(CASE WHEN rn = (n + 1) // 2 THEN n_events END) AS med FROM r
    ),
    dev AS (
      SELECT day, n_events, abs(n_events - med.med) AS adev FROM daily, med
    ),
    r2 AS (
      SELECT day, n_events, adev,
             row_number() OVER (ORDER BY adev, day) AS rn,
             count(*) OVER () AS n
      FROM dev
    ),
    mad AS (
      SELECT max(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad FROM r2
    )
    SELECT d.day, d.n_events,
           CAST(med.med AS BIGINT) AS med,
           CAST(mad.mad AS BIGINT) AS mad,
           CAST(CASE WHEN 2 * d.adev > 5 * greatest(mad.mad, 1)
                     THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
    FROM dev d, med, mad
    """,
    tags=("trend", "anomaly", "robust"),
)
def trend_anomaly_mad(spark, sf_dir):
    """Robust anomaly flags on the daily event volume via MEDIAN /
    median-absolute-deviation — the companion to the moment z-score
    (`trend_anomaly_days`): one extreme day inflates mean AND σ enough
    to hide itself from a z-test, while the median/MAD pair barely
    moves (50% breakdown point). Flag = deviation > 2.5·MAD, kept in
    integers as ``2·|x−med| > 5·max(MAD,1)`` — no division, no floats.

    Medians are exact rank-based LOWER medians (row (n+1) div 2 under a
    (value, day) total order) — deterministic, interpolation-free. The
    raw stream collapses to |days| rows in one combinable aggregate;
    both median extractions are windows over that days-sized frame, and
    the two 1-row stats broadcast back. Same sketch-sized shape at any
    corpus scale.
    """
    e = T(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"))
        # `daily` appears in the final plan 3× (median input, dev, output);
        # Spark does not CSE DataFrame subtrees, so without this the
        # events scan+agg would run 3-4×. Checkpointing the |days|-row
        # frame makes the corpus scan happen exactly once (same pattern
        # as graph.py HITS / clustering.py propagation).
        .localCheckpoint(eager=False)
    )
    wct = Window.partitionBy()

    def lower_median(df, col):
        r = df.select(
            F.col(col).alias("_v"),
            F.row_number().over(Window.orderBy(col, "day")).alias("rn"),
            F.count("*").over(wct).alias("n"),
        )
        return r.agg(
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("_v")))
        )

    med = lower_median(daily, "n_events").toDF("med")
    dev = daily.join(F.broadcast(med)).select(
        "day", "n_events", F.abs(F.col("n_events") - F.col("med")).alias("adev")
    )
    mad = lower_median(dev, "adev").toDF("mad")
    return (
        dev.join(F.broadcast(med))
        .join(F.broadcast(mad))
        .select(
            "day",
            "n_events",
            F.col("med").cast("long").alias("med"),
            F.col("mad").cast("long").alias("mad"),
            (2 * F.col("adev") > 5 * F.greatest(F.col("mad"), F.lit(1)))
            .cast("int")
            .alias("is_anomaly"),
        )
    )


_BENFORD_PERMILLE = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}


def _benford_sql() -> str:
    expected = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_PERMILLE.items()
    )
    return f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INTEGER) AS first_digit
      FROM orders
    ),
    g AS (
      SELECT first_digit, CAST(count(*) AS BIGINT) AS n
      FROM c GROUP BY first_digit
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
    SELECT first_digit, n,
           CAST((1000 * n) // total AS BIGINT) AS obs_permille,
           CAST(CASE first_digit {expected} END AS BIGINT) AS benford_permille,
           CAST((1000 * n) // total
                - CASE first_digit {expected} END AS BIGINT) AS dev_permille
    FROM g, t
    """


@query("stat_benford_first_digit", sql=_benford_sql(), tags=("stats", "audit"))
def stat_benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit audit over order totals — the
    forensic-accounting screen for fabricated or truncated numeric
    columns: natural multi-scale amounts put ~30.1% of first digits at
    1, and a synthetic or clipped generator (like this fixture's
    uniform price model) deviates visibly. Emits observed vs expected
    permille per digit; the expected distribution ships as integer
    CONSTANTS (log10 at runtime would break cross-engine bit-parity —
    the no-transcendentals rule).

    First digit via decimal-string head of the exact cents integer —
    engine-portable, no float log/pow. One combinable aggregate to 9
    rows + a 1-row total broadcast.
    """
    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    g = (
        o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("first_digit"))
        .groupBy("first_digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    t = g.agg(F.sum("n").cast("long").alias("total"))
    expected = F.create_map(
        *[F.lit(x) for dp in _BENFORD_PERMILLE.items() for x in dp]
    )[F.col("first_digit")]
    return g.join(F.broadcast(t)).select(
        "first_digit",
        "n",
        F.expr("(1000 * n) div total").cast("long").alias("obs_permille"),
        expected.cast("long").alias("benford_permille"),
        (F.expr("(1000 * n) div total") - expected).cast("long").alias("dev_permille"),
    )


_SURV_MAX_K = 28  # horizon of the survival curve (days since first seen)


@query(
    "analytics_survival_curve",
    sql=f"""
    WITH u AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_d, max(CAST(ts AS DATE)) AS last_d
      FROM events GROUP BY user_id
    ),
    hz AS (SELECT max(CAST(ts AS DATE)) AS horizon FROM events),
    v AS (
      SELECT least(date_diff('day', first_d, hz.horizon), {_SURV_MAX_K}) AS a,
             least(date_diff('day', first_d, last_d), {_SURV_MAX_K}) AS s
      FROM u, hz
    ),
    h1 AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY a),
    h2 AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY s),
    ks AS (SELECT CAST(k AS BIGINT) AS k FROM range(0, {_SURV_MAX_K + 1}) t(k)),
    ar AS (
      SELECT k, CAST(sum(coalesce(h1.c, 0))
                     OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
      FROM ks LEFT JOIN h1 ON h1.v = ks.k
    ),
    sv AS (
      SELECT k, CAST(sum(coalesce(h2.c, 0))
                     OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_survived
      FROM ks LEFT JOIN h2 ON h2.v = ks.k
    )
    SELECT ar.k AS day_k, ar.n_at_risk, sv.n_survived,
           CAST((1000 * sv.n_survived) // ar.n_at_risk AS BIGINT) AS surv_permille
    FROM ar JOIN sv ON sv.k = ar.k
    WHERE ar.n_at_risk > 0
    """,
    tags=("analytics", "survival", "retention"),
)
def analytics_survival_curve(spark, sf_dir):
    """Censoring-aware user survival curve: for each day offset k, the
    fraction of users still active ≥ k days after their first
    appearance — counting only users whose observation window REACHES k
    (first_seen + k ≤ corpus horizon). The censoring denominator is
    what `cohort_retention`'s raw matrix doesn't give you: a young user
    who *can't* have survived 28 days yet must not count as churned at
    k=28 (the classic right-censoring bias).

    Shape: no per-(user, k) explode — each user collapses to two capped
    integers (days-observable, days-survived), both ≥-counts read off
    REVERSE cumulative sums of two ≤29-bucket histograms, and the final
    frame is 29 rows. The raw stream is touched once (user-keyed
    min/max agg); everything after is sketch-sized at any corpus scale.
    """
    e = T(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"), F.max(F.to_date("ts")).alias("last_d")
    )
    hz = e.agg(F.max(F.to_date("ts")).alias("horizon"))
    v = u.join(F.broadcast(hz)).select(
        F.least(F.datediff("horizon", "first_d"), F.lit(_SURV_MAX_K)).alias("a"),
        F.least(F.datediff("last_d", "first_d"), F.lit(_SURV_MAX_K)).alias("s"),
    )
    h1 = v.groupBy(F.col("a").alias("v")).agg(F.count("*").cast("long").alias("c"))
    h2 = v.groupBy(F.col("s").alias("v")).agg(F.count("*").cast("long").alias("c"))
    ks = spark.range(0, _SURV_MAX_K + 1).select(F.col("id").alias("k"))
    wdesc = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ar = ks.join(F.broadcast(h1), ks.k == h1.v, "left").select(
        "k", F.sum(F.coalesce("c", F.lit(0))).over(wdesc).cast("long").alias("n_at_risk")
    )
    sv = ks.join(F.broadcast(h2), ks.k == h2.v, "left").select(
        "k", F.sum(F.coalesce("c", F.lit(0))).over(wdesc).cast("long").alias("n_survived")
    )
    return (
        ar.join(sv, "k")
        .where(F.col("n_at_risk") > 0)
        .select(
            F.col("k").alias("day_k"),
            "n_at_risk",
            "n_survived",
            F.expr("(1000 * n_survived) div n_at_risk").cast("long").alias("surv_permille"),
        )
    )


@query(
    "analytics_attribution_linear",
    sql="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT p.pid, e.event_id AS tid, e.event_type, e.ts,
             row_number() OVER (PARTITION BY p.pid ORDER BY e.ts, e.event_id) AS rk,
             count(*) OVER (PARTITION BY p.pid) AS nt
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts < p.pts AND e.ts >= p.pts - INTERVAL 1 HOUR
    ),
    credited AS (
      SELECT event_type,
             CAST(1000 // nt + CASE WHEN rk <= 1000 % nt THEN 1 ELSE 0 END
                  AS BIGINT) AS credit
      FROM t
    ),
    direct AS (
      SELECT 'direct' AS event_type, CAST(1000 AS BIGINT) AS credit
      FROM p LEFT JOIN (SELECT DISTINCT pid FROM t) h ON h.pid = p.pid
      WHERE h.pid IS NULL
    ),
    allc AS (SELECT * FROM credited UNION ALL SELECT * FROM direct)
    SELECT event_type AS touch_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(credit) AS BIGINT) AS credit_permille
    FROM allc GROUP BY event_type
    """,
    tags=("analytics", "attribution"),
)
def analytics_attribution_linear(spark, sf_dir):
    """LINEAR multi-touch attribution: every view/click in the hour
    before a purchase shares that conversion's credit EQUALLY — the
    complement of `analytics_attribution_last_touch`, which gives the
    final touch everything (marketing mix questions need both ends of
    the spectrum). Credit is integer permille with the division
    remainder assigned to the EARLIEST touches (rank ≤ 1000 mod n), so
    each purchase's credit sums to exactly 1000 — mass conservation a
    float split can't guarantee — and untouched purchases route 1000 to
    'direct'.

    Shape: one user-keyed range join (purchase × 1h-trailing touches —
    the same bounded-interval shape as the last-touch op), one window
    per purchase for rank/count, then a touch-type rollup. All
    integers end to end.
    """
    e = T(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    t = (
        e.where(F.col("event_type").isin("view", "click"))
        .join(p, "user_id")
        .where(
            (F.col("ts") < F.col("pts"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        )
        .select(
            "pid",
            "event_type",
            F.row_number()
            .over(Window.partitionBy("pid").orderBy("ts", "event_id"))
            .alias("rk"),
            F.count("*").over(Window.partitionBy("pid")).alias("nt"),
        )
    )
    credited = t.select(
        "event_type",
        (
            F.expr("1000 div nt")
            + F.when(F.col("rk") <= F.expr("1000 % nt"), 1).otherwise(0)
        )
        .cast("long")
        .alias("credit"),
    )
    touched = t.select("pid").distinct()
    direct = (
        p.join(touched, "pid", "left_anti")
        .select(F.lit("direct").alias("event_type"), F.lit(1000).cast("long").alias("credit"))
    )
    return (
        credited.unionByName(direct)
        .groupBy(F.col("event_type").alias("touch_type"))
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum("credit").cast("long").alias("credit_permille"),
        )
    )


@query(
    "trend_seasonal_decompose",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS observed
      FROM events GROUP BY 1
    ),
    ma AS (
      SELECT day, observed,
             CAST(CASE WHEN count(*) OVER w7 = 7
                       THEN sum(observed) OVER w7 // 7 END AS BIGINT) AS trend_ma7
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    wk AS (
      SELECT isodow(day) AS dow,
             CAST(sum(observed) // count(*)
                  - (SELECT sum(observed) // count(*) FROM daily) AS BIGINT)
               AS weekday_component
      FROM daily GROUP BY isodow(day)
    )
    SELECT m.day, m.observed, m.trend_ma7, w.weekday_component,
           CAST(m.observed - coalesce(m.trend_ma7, 0) - w.weekday_component
                AS BIGINT) AS residual
    FROM ma m JOIN wk w ON w.dow = isodow(m.day)
    """,
    tags=("trend", "seasonality"),
)
def trend_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition of the daily event series —
    observed = trend + weekday + residual, the STL-lite split every
    traffic monitor runs before alarming (a Monday dip is seasonality;
    a Monday dip WITH a residual spike is an incident). Trend is a
    centered 7-day moving average (NULL at the edges where the window
    is short — explicit, not silently biased); the weekday component
    is each ISO-weekday's mean minus the grand mean; the residual is
    what the other two don't explain.

    All integer: means are truncating divisions of exact int64 sums,
    so the decomposition replays bit-exactly cross-engine. One
    combinable aggregate collapses the corpus to |days| rows; the MA
    window, weekday profile, and grand mean are all days-sized.
    """
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("observed"))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "observed",
        F.when(
            F.count("*").over(w7) == 7,
            F.expr("sum(observed) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div 7"),
        )
        .cast("long")
        .alias("trend_ma7"),
    )
    grand = daily.agg(
        F.expr("sum(observed) div count(*)").cast("long").alias("g")
    )
    wk = (
        daily.groupBy(F.dayofweek("day").alias("dow_raw"))
        .agg(F.expr("sum(observed) div count(*)").cast("long").alias("wmean"))
        .join(F.broadcast(grand))
        .select("dow_raw", (F.col("wmean") - F.col("g")).alias("weekday_component"))
    )
    return (
        ma.join(F.broadcast(wk), F.dayofweek("day") == F.col("dow_raw"))
        .select(
            "day",
            "observed",
            "trend_ma7",
            F.col("weekday_component").cast("long").alias("weekday_component"),
            (
                F.col("observed")
                - F.coalesce(F.col("trend_ma7"), F.lit(0))
                - F.col("weekday_component")
            )
            .cast("long")
            .alias("residual"),
        )
    )


@query(
    "trend_wow_growth",
    sql="""
    WITH wk AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1
    )
    SELECT week, n_events, n_users,
           CAST((1000 * (n_events - lag(n_events) OVER w))
                // lag(n_events) OVER w AS BIGINT) AS events_wow_permille,
           CAST((1000 * (n_users - lag(n_users) OVER w))
                // lag(n_users) OVER w AS BIGINT) AS users_wow_permille
    FROM wk
    WINDOW w AS (ORDER BY week)
    """,
    tags=("trend", "growth"),
)
def trend_wow_growth(spark, sf_dir):
    """Week-over-week growth rates for volume and reach — THE reported
    growth metric (integer permille: +120 = +12.0% WoW), first week
    NULL rather than a fabricated baseline. Week indexes are epoch-day
    div 7 (engine-neutral, unambiguous about week starts — the
    `cohort_retention` rule).

    One combinable aggregate collapses the corpus to |weeks| rows (the
    distinct-user count is the only shuffle, keyed on the unique id);
    the lag window and growth arithmetic are weeks-sized. Division is
    truncating int64 over exact counts — bit-stable cross-engine.
    """
    e = T(spark, sf_dir, "events")
    wk = e.groupBy(
        F.expr("datediff(CAST(ts AS DATE), DATE'2024-01-01') div 7").alias("week")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return wk.select(
        "week",
        "n_events",
        "n_users",
        F.expr(
            "(1000 * (n_events - lag(n_events) OVER (ORDER BY week)))"
            " div lag(n_events) OVER (ORDER BY week)"
        ).cast("long").alias("events_wow_permille"),
        F.expr(
            "(1000 * (n_users - lag(n_users) OVER (ORDER BY week)))"
            " div lag(n_users) OVER (ORDER BY week)"
        ).cast("long").alias("users_wow_permille"),
    )


_CEP_SQL = """
    WITH j AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
      FROM events GROUP BY user_id, 2
    )
    SELECT user_id, day,
           CAST(len(journey) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(journey, 'vcp')) AS BIGINT) AS n_funnels,
           CAST(len(regexp_extract_all(journey, 'ee+')) AS BIGINT) AS n_error_bursts,
           CAST(coalesce(list_max(list_transform(regexp_extract_all(journey, 'v+'),
                                                 x -> len(x))), 0) AS BIGINT)
             AS longest_view_run
    FROM j
    """


@query("analytics_event_pattern_cep", sql=_CEP_SQL, tags=("analytics", "events", "cep"))
def analytics_event_pattern_cep(spark, sf_dir):
    """Complex-event-processing pattern matching (MATCH_RECOGNIZE-lite):
    per (user, day), the time-ordered event-type sequence is rendered
    as a journey string (one char per event — the five fixture types
    have distinct initials) and regex patterns count behavioral motifs:
    strict view→click→purchase funnels (`vcp`, non-overlapping),
    error bursts (`ee+`, each maximal run of >= 2 errors counts once),
    and the longest uninterrupted view streak. The regex-over-journey
    trick expresses sequence patterns SQL windows can't state cleanly
    (arbitrary regular languages over event alphabets) while staying
    engine-portable: greedy non-overlapping matching is identical in
    Spark and DuckDB, and the (ts, event_id) ordering makes the string
    itself deterministic.

    Scale shape: one shuffle on (user, day); the journey string is
    bounded by a user's events per DAY (never their lifetime), so
    per-group state stays small at any corpus size — the same
    bounded-key trick the streaming dedup uses. collect_list +
    array_sort keeps ordering exact without a second window pass.
    """
    e = T(spark, sf_dir, "events")
    journey = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
                    )
                )
            ),
            lambda s: s["c"],
        ),
        "",
    )
    j = e.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(journey.alias("journey"))
    runs = F.regexp_extract_all(F.col("journey"), F.lit("v+"), 0)
    return j.select(
        "user_id",
        "day",
        F.length("journey").cast("long").alias("n_events"),
        F.size(F.regexp_extract_all(F.col("journey"), F.lit("vcp"), 0))
        .cast("long")
        .alias("n_funnels"),
        F.size(F.regexp_extract_all(F.col("journey"), F.lit("ee+"), 0))
        .cast("long")
        .alias("n_error_bursts"),
        F.coalesce(
            F.array_max(F.transform(runs, lambda x: F.length(x))), F.lit(0)
        )
        .cast("long")
        .alias("longest_view_run"),
    )


@query(
    "trend_holt_linear_forecast",
    sql="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(c ORDER BY day) AS cs FROM daily GROUP BY 1
    ),
    hw(event_type, i, l, b) AS (
      SELECT event_type, 1, CAST(cs[1] AS DOUBLE), CAST(0 AS DOUBLE)
      FROM series
      UNION ALL
      SELECT h.event_type, h.i + 1,
             CAST(0.5 AS DOUBLE) * CAST(s.cs[h.i + 1] AS DOUBLE)
               + CAST(0.5 AS DOUBLE) * (h.l + h.b),
             CAST(0.25 AS DOUBLE)
               * ((CAST(0.5 AS DOUBLE) * CAST(s.cs[h.i + 1] AS DOUBLE)
                   + CAST(0.5 AS DOUBLE) * (h.l + h.b)) - h.l)
               + CAST(0.75 AS DOUBLE) * h.b
      FROM hw h JOIN series s USING (event_type)
      WHERE h.i < len(s.cs)
    )
    SELECT h.event_type, CAST(s.n AS BIGINT) AS n_days,
           h.l AS level, h.b AS trend,
           h.l + CAST(7 AS DOUBLE) * h.b AS forecast_7d
    FROM hw h JOIN (SELECT event_type, len(cs) AS n FROM series) s
      USING (event_type)
    WHERE h.i = s.n
    """,
    tags=("trend", "forecast"),
)
def trend_holt_linear_forecast(spark, sf_dir):
    """Holt double-exponential smoothing (level + linear trend,
    α = 0.5, β = 0.25) over each event_type's daily count series, plus
    a 7-day-ahead forecast — the capacity-planning / volume-projection
    primitive one rung above the EWMA monitor (`trend_ewma_spikes`
    smooths level only; this one models drift).

    Determinism: the recurrence is a SEQUENTIAL left fold by
    definition, so floats are the repo-pinned replayable kind — Spark
    folds a per-type ordered array with `F.aggregate` (JVM-side struct
    accumulator), DuckDB replays the identical arithmetic as a
    recursive CTE over plain columns, same constants, same order,
    bit-exact. The oracle deliberately avoids DuckDB's struct-typed
    `list_reduce` accumulators: struct_pack fields there are assigned
    IN PLACE in field order, so a 2-variable recurrence reads the
    freshly-overwritten level while computing the trend (probed this
    session: [10,12,15] → b = 0.453125 instead of 0.71875) — plain
    recursive-CTE columns sidestep the quirk entirely.

    Scale shape: one shuffle to (type, day) counts; the fold input is
    a days-sized array per type (bounded by the calendar, not the
    corpus), folded JVM-side inside whole-stage codegen — the corpus
    never touches Python and the sequential part is O(days), not
    O(rows).
    """
    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "c"))), lambda s: s["c"]
        ).alias("cs")
    )
    A, B, one = F.lit(0.5), F.lit(0.25), F.lit(1.0)
    structs = F.transform(
        "cs",
        lambda c: F.struct(
            c.cast("double").alias("l"), F.lit(0.0).alias("b"), c.cast("double").alias("c")
        ),
    )

    def step(a, x):
        lnew = A * x["c"] + (one - A) * (a["l"] + a["b"])
        bnew = (
            B * ((A * x["c"] + (one - A) * (a["l"] + a["b"])) - a["l"])
            + (one - B) * a["b"]
        )
        return F.struct(lnew.alias("l"), bnew.alias("b"), x["c"].alias("c"))

    folded = F.aggregate(
        F.slice(structs, 2, F.size(structs) - 1), F.element_at(structs, 1), step
    )
    return series.select(
        "event_type",
        F.size("cs").cast("long").alias("n_days"),
        folded["l"].alias("level"),
        folded["b"].alias("trend"),
        (folded["l"] + F.lit(7.0) * folded["b"]).alias("forecast_7d"),
    )


@query(
    "trend_holt_winters_seasonal",
    sql="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(c ORDER BY day) AS cs FROM daily GROUP BY 1
      HAVING count(*) >= 14
    ),
    init AS (
      SELECT event_type, cs,
             (CAST(cs[1] AS DOUBLE) + CAST(cs[2] AS DOUBLE)
              + CAST(cs[3] AS DOUBLE) + CAST(cs[4] AS DOUBLE)
              + CAST(cs[5] AS DOUBLE) + CAST(cs[6] AS DOUBLE)
              + CAST(cs[7] AS DOUBLE)) / 7.0 AS l0,
             ((CAST(cs[8] AS DOUBLE) + CAST(cs[9] AS DOUBLE)
               + CAST(cs[10] AS DOUBLE) + CAST(cs[11] AS DOUBLE)
               + CAST(cs[12] AS DOUBLE) + CAST(cs[13] AS DOUBLE)
               + CAST(cs[14] AS DOUBLE))
              - (CAST(cs[1] AS DOUBLE) + CAST(cs[2] AS DOUBLE)
                 + CAST(cs[3] AS DOUBLE) + CAST(cs[4] AS DOUBLE)
                 + CAST(cs[5] AS DOUBLE) + CAST(cs[6] AS DOUBLE)
                 + CAST(cs[7] AS DOUBLE))) / 49.0 AS b0
      FROM series
    ),
    hw(event_type, i, l, b, s) AS (
      SELECT event_type, 7, l0, b0,
             [CAST(cs[1] AS DOUBLE) - l0, CAST(cs[2] AS DOUBLE) - l0,
              CAST(cs[3] AS DOUBLE) - l0, CAST(cs[4] AS DOUBLE) - l0,
              CAST(cs[5] AS DOUBLE) - l0, CAST(cs[6] AS DOUBLE) - l0,
              CAST(cs[7] AS DOUBLE) - l0]
      FROM init
      UNION ALL
      SELECT h.event_type, h.i + 1,
             0.5 * (CAST(n.cs[h.i + 1] AS DOUBLE) - h.s[1])
               + 0.5 * (h.l + h.b),
             0.25 * ((0.5 * (CAST(n.cs[h.i + 1] AS DOUBLE) - h.s[1])
                      + 0.5 * (h.l + h.b)) - h.l)
               + 0.75 * h.b,
             list_append(h.s[2:7],
               0.5 * (CAST(n.cs[h.i + 1] AS DOUBLE)
                      - (0.5 * (CAST(n.cs[h.i + 1] AS DOUBLE) - h.s[1])
                         + 0.5 * (h.l + h.b)))
                 + 0.5 * h.s[1])
      FROM hw h JOIN series n USING (event_type)
      WHERE h.i < len(n.cs)
    )
    SELECT h.event_type, CAST(t.n AS BIGINT) AS n_days,
           h.l AS level, h.b AS trend, h.s[7] AS season_last,
           h.l + 7.0 * h.b + h.s[7] AS forecast_7d
    FROM hw h JOIN (SELECT event_type, len(cs) AS n FROM series) t
      USING (event_type)
    WHERE h.i = t.n
    """,
    tags=("trend", "forecast"),
)
def trend_holt_winters_seasonal(spark, sf_dir):
    """Holt-Winters ADDITIVE triple-exponential smoothing (level +
    linear trend + weekly seasonality, α = 0.5, β = 0.25, γ = 0.5,
    m = 7) per event type, with the 7-day-ahead forecast — the full
    seasonal upgrade of `trend_holt_linear_forecast` for series where
    the weekday cycle dominates (page views, job submissions). Init
    is the classical two-period recipe: l₀ = mean of week 1, b₀ =
    (mean of week 2 − mean of week 1)/7, s₁..₇ = week-1 residuals;
    types with < 14 days are excluded on both sides.

    Determinism: same contract as the Holt-linear twin — the
    recurrence is a sequential fold, so Spark runs it as F.aggregate
    over the per-type ordered array with a struct(level, trend,
    seasonal-ring array<double>) accumulator (JVM-side, whole-stage
    codegen), and DuckDB replays the IDENTICAL expression tree as a
    recursive CTE carrying a LIST column (plain columns, never the
    in-place struct_pack accumulator quirk the linear twin's
    docstring documents). All constants are exactly-representable
    binary fractions; the init means divide exact integer sums.

    Scale shape: one shuffle to (type, day) counts; everything after
    is a days-bounded fold per type — O(calendar), not O(corpus). The
    m-element ring rides inside the accumulator, so state is 9 doubles
    however long the series runs.
    """
    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"].cast("double"),
            ).alias("cs")
        )
        .where(F.size("cs") >= 14)
    )
    cs = F.col("cs")
    wk = lambda lo: sum(  # noqa: E731 — fixed left-to-right 7-term sum
        (F.element_at(cs, i) for i in range(lo + 1, lo + 7)),
        F.element_at(cs, lo),
    )
    l0 = (wk(1) / F.lit(7.0)).alias("l0")
    b0 = ((wk(8) - wk(1)) / F.lit(49.0)).alias("b0")
    init = series.select("event_type", "cs", l0, b0)
    s0 = F.array(
        *[F.element_at(cs, i) - F.col("l0") for i in range(1, 8)]
    )
    A, B, G = F.lit(0.5), F.lit(0.25), F.lit(0.5)
    one = F.lit(1.0)

    def step(a, x):
        sold = F.element_at(a["s"], 1)
        lnew_e = A * (x - sold) + (one - A) * (a["l"] + a["b"])
        bnew = B * ((A * (x - sold) + (one - A) * (a["l"] + a["b"])) - a["l"]) + (
            one - B
        ) * a["b"]
        snew = (
            G * (x - (A * (x - sold) + (one - A) * (a["l"] + a["b"])))
            + (one - G) * sold
        )
        return F.struct(
            lnew_e.alias("l"),
            bnew.alias("b"),
            F.concat(F.slice(a["s"], 2, 6), F.array(snew)).alias("s"),
        )

    acc0 = F.struct(
        F.col("l0").alias("l"), F.col("b0").alias("b"), s0.alias("s")
    )
    folded = F.aggregate(F.slice(cs, 8, F.size(cs) - 7), acc0, step)
    return init.select(
        "event_type",
        F.size("cs").cast("long").alias("n_days"),
        folded["l"].alias("level"),
        folded["b"].alias("trend"),
        F.element_at(folded["s"], 7).alias("season_last"),
        (folded["l"] + F.lit(7.0) * folded["b"] + F.element_at(folded["s"], 7)).alias(
            "forecast_7d"
        ),
    )


# --- Markov removal-effect attribution -------------------------------------
#
# Shared textual fragments: both engines assemble probabilities, the
# absorption iteration, and the removal effects from the SAME strings
# (Spark via F.expr / mirrored Column trees), so every double operation
# has an identical expression tree — the repo's determinism contract
# for iterative float math (see trend_holt_winters_seasonal).
_MK_TOUCH = ("view", "click", "signup", "error")
_MK_FROM = ("start",) + _MK_TOUCH
_MK_TO = _MK_TOUCH + ("conv", "nul")
_MK_K = 32  # fixed iteration count: identical on both engines, so the
# result is bit-equal whether or not the chain has fully converged


def _mk_prob_exprs() -> list[str]:
    out = []
    for s in _MK_FROM:
        tot = " + ".join(f"n_{s}_{t}" for t in _MK_TO)
        out.append(f"({tot}) AS n_{s}")
    for s in _MK_FROM:
        for t in _MK_TOUCH + ("conv",):
            out.append(
                f"(CASE WHEN n_{s} = 0 THEN 0.0 "
                f"ELSE CAST(n_{s}_{t} AS DOUBLE) / CAST(n_{s} AS DOUBLE) END)"
                f" AS p_{s}_{t}"
            )
    return out


def _mk_mask_exprs() -> list[str]:
    out = []
    for s in _MK_FROM:
        for t in _MK_TOUCH:
            out.append(
                f"(CASE WHEN scenario = '{t}' THEN 0.0 ELSE p_{s}_{t} END)"
                f" AS q_{s}_{t}"
            )
        out.append(f"p_{s}_conv AS q_{s}_conv")
    return out


def _mk_step_sql(s: str, v: dict[str, str]) -> str:
    """One absorption update for state `s`: q_s_conv + Σ_t q_s_t · v_t,
    terms in the fixed (conv, view, click, signup, error) order."""
    return f"q_{s}_conv + " + " + ".join(
        f"q_{s}_{t} * {v[t]}" for t in _MK_TOUCH
    )


# a corpus with zero conversions gives v_base = 0 exactly (every term
# in the absorption sum is 0); x/0.0 is engine-version-sensitive, so
# effects (and the shares derived from them) degrade to NULL instead
_MK_EFFECTS = [
    f"(CASE WHEN v_base = 0.0 THEN NULL ELSE 1.0 - v_{t} / v_base END) AS e_{t}"
    for t in _MK_TOUCH
]
_MK_TOTAL = "(((e_view + e_click) + e_signup) + e_error)"
# share = e_t / total: NULL effects propagate through total naturally;
# an exactly-zero total (effects cancelling) is the one residual 0/0
_MK_SHARE = {
    t: f"CASE WHEN {_MK_TOTAL} = 0.0 THEN NULL ELSE e_{t} / {_MK_TOTAL} END"
    for t in _MK_TOUCH
}

def _mk_count_cell_exprs() -> list[str]:
    """One exact-BIGINT count cell per (from, to) transition.

    The SAME expression text feeds the DuckDB oracle CTE (joined into
    ``_MK_COUNT_CELLS``) and the Spark ``agg`` (one ``F.expr`` per cell),
    so the two engines' cell definitions cannot drift apart.
    """
    return [
        f"CAST(coalesce(sum(CASE WHEN f = '{'START' if s == 'start' else s}' "
        f"AND t = '{t.upper() if t in ('conv', 'nul') else t}' THEN n END), 0) AS BIGINT)"
        f" AS n_{s}_{t}"
        for s in _MK_FROM
        for t in _MK_TO
    ]


_MK_COUNT_CELLS = ", ".join(_mk_count_cell_exprs())

_MARKOV_SQL = f"""
    WITH RECURSIVE fp AS (
      SELECT user_id, min(ts) AS fpts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    kept AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             fp.fpts IS NOT NULL AS has_conv
      FROM events e LEFT JOIN fp USING (user_id)
      WHERE fp.fpts IS NULL OR e.ts < fp.fpts
    ),
    seq AS (
      SELECT user_id, event_type AS f, has_conv,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM kept
    ),
    trans AS (
      SELECT f, coalesce(nxt, CASE WHEN has_conv THEN 'CONV' ELSE 'NUL' END) AS t,
             CAST(count(*) AS BIGINT) AS n
      FROM seq GROUP BY 1, 2
      UNION ALL
      SELECT 'START', f, CAST(count(*) AS BIGINT) FROM seq WHERE rn = 1 GROUP BY 2
      UNION ALL
      SELECT 'START', 'CONV', CAST(count(*) AS BIGINT)
      FROM fp LEFT JOIN (SELECT DISTINCT user_id FROM kept) k USING (user_id)
      WHERE k.user_id IS NULL
      HAVING count(*) > 0
    ),
    cells AS (SELECT {_MK_COUNT_CELLS} FROM trans),
    probs AS (SELECT *, {", ".join(_mk_prob_exprs())} FROM cells),
    scen AS (
      SELECT *, {", ".join(_mk_mask_exprs())}
      FROM probs, (SELECT unnest(['BASE', 'view', 'click', 'signup', 'error'])
                   AS scenario) s
    ),
    it(scenario, i, vv, vc, vs, ve) AS (
      SELECT scenario, 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
             CAST(0 AS DOUBLE), CAST(0 AS DOUBLE) FROM scen
      UNION ALL
      SELECT it.scenario, it.i + 1,
             {_mk_step_sql("view", dict(view="it.vv", click="it.vc", signup="it.vs", error="it.ve"))},
             {_mk_step_sql("click", dict(view="it.vv", click="it.vc", signup="it.vs", error="it.ve"))},
             {_mk_step_sql("signup", dict(view="it.vv", click="it.vc", signup="it.vs", error="it.ve"))},
             {_mk_step_sql("error", dict(view="it.vv", click="it.vc", signup="it.vs", error="it.ve"))}
      FROM it JOIN scen USING (scenario) WHERE it.i < {_MK_K}
    ),
    vstart AS (
      SELECT it.scenario,
             {_mk_step_sql("start", dict(view="it.vv", click="it.vc", signup="it.vs", error="it.ve"))}
               AS v
      FROM it JOIN scen USING (scenario) WHERE it.i = {_MK_K}
    ),
    wide AS (
      SELECT max(CASE WHEN scenario = 'BASE' THEN v END) AS v_base,
             {", ".join(f"max(CASE WHEN scenario = '{t}' THEN v END) AS v_{t}" for t in _MK_TOUCH)}
      FROM vstart
    ),
    eff AS (SELECT *, {", ".join(_MK_EFFECTS)} FROM wide)
    {" UNION ALL ".join(
        f"SELECT '{t}' AS channel, e_{t} AS removal_effect, "
        f"{_MK_SHARE[t]} AS attribution_share, v_base AS base_cvr FROM eff"
        for t in _MK_TOUCH)}
    """


@query("analytics_markov_attribution", sql=_MARKOV_SQL, tags=("analytics", "attribution"))
def analytics_markov_attribution(spark, sf_dir):
    """Markov-chain (removal-effect) multi-touch attribution — the
    data-driven successor to last-touch/linear credit: model each
    user's pre-conversion journey as a first-order chain over touch
    states {view, click, signup, error} with absorbing CONV/NULL,
    compute the START→CONV absorption probability, then re-compute it
    with each channel REMOVED (transitions into it become lost mass);
    a channel's credit is its removal effect 1 − v̂/v, normalized.
    Journeys truncate at the first purchase; users whose first event
    is a purchase contribute a direct START→CONV edge.

    Determinism: transition counts are exact int64; probabilities and
    the K = 32 fixed-point absorption iterations (v ← P·v + p_conv,
    v₀ = 0 — monotone convergent, but the pin is the FIXED K, not
    convergence) evaluate the same generated expression text on both
    engines — Spark folds a length-K sequence with an array<double>
    accumulator (the `trend_holt_winters_seasonal` pattern), DuckDB
    runs the identical arithmetic as a recursive CTE over the 5
    scenario rows (BASE + 4 removals).

    Scale shape: the corpus-sized work is one per-user window pass +
    a transition count (partial+final, ≤ 7×7 groups). Everything
    after runs on ONE 30-cell row — the iteration is O(K·|states|²)
    driver-free constant work however large the corpus is.
    """
    ev = T(spark, sf_dir, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fpts"))
    )
    j = ev.join(fp, "user_id", "left")
    kept = j.where(F.col("fpts").isNull() | (F.col("ts") < F.col("fpts"))).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.col("fpts").isNotNull().alias("has_conv"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = kept.select(
        "user_id",
        F.col("event_type").alias("f"),
        "has_conv",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    ).localCheckpoint(eager=False)
    t_mid = seq.groupBy(
        "f",
        F.coalesce(
            "nxt", F.when(F.col("has_conv"), "CONV").otherwise("NUL")
        ).alias("t"),
    ).agg(F.count("*").alias("n"))
    t_start = (
        seq.where(F.col("rn") == 1)
        .groupBy(F.col("f").alias("t"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("START").alias("f"), "t", "n")
    )
    t_direct = (
        fp.join(kept.select("user_id").distinct(), "user_id", "left_anti")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 0)
        .select(F.lit("START").alias("f"), F.lit("CONV").alias("t"), "n")
    )
    trans = t_mid.unionByName(t_start).unionByName(t_direct)
    cells = trans.agg(*[F.expr(e) for e in _mk_count_cell_exprs()])
    probs = cells.select("*", *[F.expr(e) for e in _mk_prob_exprs()])
    scen = probs.select(
        "*",
        F.explode(
            F.array(*[F.lit(x) for x in ("BASE", "view", "click", "signup", "error")])
        ).alias("scenario"),
    ).select("*", *[F.expr(e) for e in _mk_mask_exprs()])

    def step(a, _x):
        v = {t: F.element_at(a, i + 1) for i, t in enumerate(_MK_TOUCH)}

        def upd(s):
            acc = F.col(f"q_{s}_conv")
            for t in _MK_TOUCH:
                acc = acc + F.col(f"q_{s}_{t}") * v[t]
            return acc

        return F.array(*[upd(s) for s in _MK_TOUCH])

    folded = F.aggregate(
        F.sequence(F.lit(1), F.lit(_MK_K)),
        F.array(*[F.lit(0.0) for _ in _MK_TOUCH]),
        step,
    )
    v = {t: F.element_at(folded, i + 1) for i, t in enumerate(_MK_TOUCH)}
    vstart = F.col("q_start_conv")
    for t in _MK_TOUCH:
        vstart = vstart + F.col(f"q_start_{t}") * v[t]
    per_scen = scen.select("scenario", vstart.alias("v"))
    wide = per_scen.agg(
        F.max(F.when(F.col("scenario") == "BASE", F.col("v"))).alias("v_base"),
        *[
            F.max(F.when(F.col("scenario") == t, F.col("v"))).alias(f"v_{t}")
            for t in _MK_TOUCH
        ],
    )
    eff = wide.select("*", *[F.expr(e) for e in _MK_EFFECTS])
    return eff.select(
        F.expr(
            "stack(4, "
            + ", ".join(
                f"'{t}', e_{t}, {_MK_SHARE[t]}" for t in _MK_TOUCH
            )
            + ") AS (channel, removal_effect, attribution_share)"
        ),
        F.col("v_base").alias("base_cvr"),
    )


_DECAY_TOPK = 20


@query(
    "analytics_decayed_leaderboard",
    sql=f"""
    WITH spine AS (
      SELECT min(CAST(date_trunc('day', ts) AS DATE)) AS d0 FROM events
    ),
    w AS (
      SELECT user_id,
             CAST(1 AS BIGINT)
               << least(CAST(date_diff('day', spine.d0,
                                       CAST(date_trunc('day', ts) AS DATE))
                              AS INTEGER), 62) AS wt,
             CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events, spine
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(wt) AS BIGINT) AS decayed_score,
           max(day) AS last_day
    FROM w GROUP BY user_id
    ORDER BY decayed_score DESC, user_id
    LIMIT {_DECAY_TOPK}
    """,
    tags=("analytics", "trend", "leaderboard"),
)
def analytics_decayed_leaderboard(spark, sf_dir):
    """Exponentially time-decayed activity leaderboard — the "trending
    now" ranking where yesterday's burst outweighs last month's grind:
    each event contributes weight decay^age with half-life = 1 day.
    Because the decay base is 2, the weight is EXACTLY 1 << (day − d0)
    — pure int64 arithmetic, no float accumulation anywhere, so the
    scores (not just the ranking) are bit-identical across engines and
    reduction orders. The shift is capped at 62 to stay in int64; a
    window wider than ~62 half-lives would rebase d0 to the window
    start instead (events older than that carry ~0 weight anyway).

    Scale shape: one map-side-combinable groupBy(user) over the corpus
    (the weight is a per-row projection off a broadcast scalar d0),
    then TakeOrderedAndProject for the top-k — no global sort, no
    second shuffle. Ties break on user_id so the LIMIT row set is
    engine-independent.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    w = ev.join(F.broadcast(d0)).select(
        "user_id",
        "day",
        F.expr("shiftleft(CAST(1 AS BIGINT), least(datediff(day, d0), 62))").alias(
            "wt"
        ),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("wt").cast("long").alias("decayed_score"),
            F.max("day").alias("last_day"),
        )
        .orderBy(F.desc("decayed_score"), "user_id")
        .limit(_DECAY_TOPK)
    )


@query(
    "analytics_ltv_cohort_revenue",
    sql="""
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
    ),
    rev AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', f.cohort_day) // 7
                  AS BIGINT) AS cohort_week,
             CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7
                  AS BIGINT) AS week_offset,
             e.user_id,
             CASE WHEN e.event_type = 'purchase'
                  THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END AS cents
      FROM events e JOIN f USING (user_id)
    ),
    cell AS (
      SELECT cohort_week, week_offset,
             CAST(sum(cents) AS BIGINT) AS rev_cents,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
      FROM rev GROUP BY 1, 2
    ),
    size_ AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', cohort_day) // 7
                  AS BIGINT) AS cohort_week,
             CAST(count(*) AS BIGINT) AS cohort_users
      FROM f GROUP BY 1
    )
    SELECT c.cohort_week, c.week_offset, s.cohort_users, c.n_active,
           CAST(sum(c.rev_cents) OVER (PARTITION BY c.cohort_week
                                       ORDER BY c.week_offset
                                       ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_rev_cents,
           CAST(sum(c.rev_cents) OVER (PARTITION BY c.cohort_week
                                       ORDER BY c.week_offset
                                       ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / (100.0 * s.cohort_users) AS ltv_per_user
    FROM cell c JOIN size_ s USING (cohort_week)
    """,
    tags=("analytics", "revenue", "cohort"),
)
def analytics_ltv_cohort_revenue(spark, sf_dir):
    """Cohort LTV curves — cumulative purchase revenue per signup
    cohort by week-of-life, normalized per cohort user: the payback /
    lifetime-value read every growth team lays over CAC, and the
    revenue-weighted companion of `cohort_retention` (same epoch-anchored
    integer week indexing, so the two matrices align cell-for-cell).

    Money stays exact: purchase values are true 2-decimal doubles, so
    round(value·100) recovers integer cents (the fxp rule) and every
    sum — per cell and the running cumulative — is int64; the only
    double is the final per-user normalization. Scale shape: first-seen
    is one user-keyed agg joined back co-partitioned; the cell grid is
    |cohorts|×|offsets|; the cumulative window runs over that tiny
    grid, never the event scan.
    """
    e = T(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    epoch = F.lit("2024-01-01").cast("date")
    rev = e.join(f, "user_id").select(
        F.floor(F.datediff(F.col("cohort_day"), epoch) / 7)
        .cast("long")
        .alias("cohort_week"),
        F.floor(F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7)
        .cast("long")
        .alias("week_offset"),
        "user_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("cents"),
    )
    cell = rev.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").cast("long").alias("rev_cents"),
        F.count_distinct("user_id").cast("long").alias("n_active"),
    )
    size = f.groupBy(
        F.floor(F.datediff(F.col("cohort_day"), epoch) / 7)
        .cast("long")
        .alias("cohort_week")
    ).agg(F.count("*").cast("long").alias("cohort_users"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = cell.join(F.broadcast(size), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "cohort_users",
        "n_active",
        F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
        (
            F.sum("rev_cents").over(w).cast("double")
            / (F.lit(100.0) * F.col("cohort_users"))
        ).alias("ltv_per_user"),
    )
    return out


@query(
    "analytics_funnel_any_order",
    sql="""
    WITH ud AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           + 4 * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS mask
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(mask AS BIGINT) AS step_mask,
           CAST(count(*) AS BIGINT) AS n_user_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ud GROUP BY mask
    """,
    tags=("analytics", "funnel", "combination"),
)
def analytics_funnel_any_order(spark, sf_dir):
    """UNORDERED funnel (combination analysis) — which SETS of the
    view/click/purchase steps a user-day exhibits, regardless of
    sequence. The ordered funnels (`funnel_conversion`,
    `analytics_funnel_windowed`) answer "did they follow the path";
    this answers the complementary diagnostic "which steps co-occur at
    all" — mask 5 (view+purchase, no click) quantifies path-skipping
    that an ordered funnel silently folds away, and mask 4
    (purchase-only) is the attribution blind spot.

    Shape: one groupBy(user, day) building a 3-bit presence mask from
    conditional maxes (combinable — no DISTINCT explosion), then an
    8-group rollup. The distinct-user count per mask rides the same
    shuffle. All-integer output.
    """
    ev = T(spark, sf_dir, "events")
    bit = lambda t, w: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    ) * w
    ud = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        (bit("view", 1) + bit("click", 2) + bit("purchase", 4)).alias("mask")
    )
    return ud.groupBy(F.col("mask").cast("long").alias("step_mask")).agg(
        F.count("*").cast("long").alias("n_user_days"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@query(
    "analytics_shapley_attribution",
    sql="""
    WITH ud AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    mc AS (
      SELECT mask, CAST(sum(conv) AS BIGINT) AS conv_n FROM ud GROUP BY mask
    ),
    v AS (
      SELECT CAST(i AS INTEGER) AS s,
             CAST(coalesce((SELECT sum(mc.conv_n) FROM mc
                            WHERE (mc.mask & ~CAST(i AS INTEGER) & 7) = 0), 0)
               AS BIGINT) AS v
      FROM range(0, 8) t(i)
    ),
    ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2), ('signup', 4))
           AS t(channel, bit))
    SELECT ch.channel,
           CAST(sum((CASE (vs.s & 1) + ((vs.s >> 1) & 1) + ((vs.s >> 2) & 1)
                     WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
                    * (vi.v - vs.v)) AS BIGINT) AS phi6,
           CAST(sum((CASE (vs.s & 1) + ((vs.s >> 1) & 1) + ((vs.s >> 2) & 1)
                     WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
                    * (vi.v - vs.v)) AS BIGINT) / 6.0 AS shapley
    FROM ch
    JOIN v vs ON (vs.s & ch.bit) = 0
    JOIN v vi ON vi.s = (vs.s | ch.bit)
    GROUP BY ch.channel
    """,
    tags=("analytics", "attribution", "shapley"),
)
def analytics_shapley_attribution(spark, sf_dir):
    """EXACT Shapley-value attribution over the three pre-conversion
    channels (view / click / signup), conversion = purchase in the same
    user-day: φ_i = Σ_{S∌i} |S|!(2−|S|)!/3! · [v(S∪{i}) − v(S)] with
    the subset characteristic v(S) = converting user-days whose
    touch-set ⊆ S. Completes the attribution family — last-touch and
    linear are positional heuristics, Markov is removal-effect; Shapley
    is the coalition-game answer (the only one that is symmetric,
    additive, and null-player-zero at once). With 3 channels the 2³
    coalitions are enumerated exactly — no sampling approximation.

    Exactness: v(·) values are int64 conversion counts; the factorial
    weights {2,1,2} make 6·φ_i an exact int64 (`phi6`), and `shapley`
    is one int/6.0 division. Σφ_i = v(N) − v(∅) by construction
    (v(∅) = purchase-only days — the unattributable base the efficiency
    axiom exposes rather than hides). Scale shape: ONE combinable
    (user, day) groupBy over the fact table; everything after runs on
    the 8-row mask frame × 8-row coalition lattice.
    """
    ev = T(spark, sf_dir, "events")
    bit = lambda t, w: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    ) * w
    ud = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        (bit("view", 1) + bit("click", 2) + bit("signup", 4)).alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    mc = ud.groupBy("mask").agg(F.sum("conv").cast("long").alias("conv_n"))
    lattice = spark.range(8).select(F.col("id").cast("int").alias("s"))
    v = (
        lattice.join(
            F.broadcast(mc), F.expr("(mask & ~s & 7) = 0"), "left"
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv_n"), F.lit(0)).cast("long").alias("v"))
    )
    ch = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], "channel string, bit int"
    )
    w = F.expr(
        "CASE (s & 1) + ((s >> 1) & 1) + ((s >> 2) & 1) "
        "WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END"
    )
    vi = v.select(F.col("s").alias("si"), F.col("v").alias("vn"))
    return (
        ch.join(F.broadcast(v), F.expr("(s & bit) = 0"))
        .join(F.broadcast(vi), F.expr("si = (s | bit)"))
        .groupBy("channel")
        .agg(F.sum(w * (F.col("vn") - F.col("v"))).cast("long").alias("phi6"))
        .select(
            "channel",
            "phi6",
            (F.col("phi6").cast("long") / F.lit(6.0)).alias("shapley"),
        )
    )
