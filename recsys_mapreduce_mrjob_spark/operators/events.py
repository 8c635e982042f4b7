"""Streaming-shaped operators over the events table (SURVEY.md §2.2.J).

Absent from the reference (pure batch MapReduce); declared because the
engine's north star includes stream processing.  Each query here is the
BATCH formulation — deterministic and oracle-checkable — of a Structured
Streaming operator; the streaming twins (``readStream`` + ``withWatermark``
+ the same transformations) live in :mod:`..streaming.twins` and are
deliberately undeclared (stream micro-batch boundaries are not
hash-reproducible).  Semantics are defined so batch and streaming agree on
the same input.

Event-time outputs are projected as epoch SECONDS (BIGINT): engines hash
timestamps differently (precision, tz attachment), integers are portable
(SURVEY §7.4).

Scale notes (100 TB of events):
  - Tumbling/sliding aggregation shuffles once on (bucket, type) — the
    bucket key is derived, so partition count scales with time-range ×
    cardinality, not input rows.  Sliding windows multiply input ×
    (length/slide) inside the Expand before the shuffle, same as any
    streaming engine's pane replication.
  - Sessionization is one shuffle on user_id + a linear in-partition scan
    (lag + running sum) — the classic parallel sessionize; no per-user
    Python, no collect.
  - Late-data filtering computes the global max(ts) with a scalar-subquery
    aggregate (one tiny job) instead of a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_events


def _round4(c):
    return F.round(c, 4) + F.lit(0.0)


# DuckDB-side epoch seconds for a µs timestamp (floor = Spark unix_timestamp).
_EPOCH = "CAST(floor(epoch(ts)) AS BIGINT)"


@register(
    "q_window_tumbling",
    oracle=f"""
SELECT {_EPOCH} - {_EPOCH} % 3600 AS bucket_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) + 0.0 AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type (``F.window`` — the same
    operator Structured Streaming uses; epoch-aligned buckets)."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _round4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_window_sliding",
    oracle=f"""
WITH panes AS (
    SELECT ({_EPOCH} - {_EPOCH} % 900) - k.k * 900 AS window_start,
           event_type, value
    FROM events
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 4) + 0.0 AS sum_value
FROM panes
GROUP BY 1, 2
""",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min: each event belongs to exactly
    4 overlapping windows (length/slide panes).  The oracle replicates each
    event to its 4 window starts explicitly — validated equivalent to
    Spark's window semantics (epoch-aligned, start ≤ ts < start+1h)."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _round4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_window_session",
    oracle=f"""
WITH flagged AS (
    -- lag MUST order by the same key Spark uses (epoch-second ts_epoch,
    -- event_id) — ordering by raw µs ts diverges whenever two same-user
    -- events share an epoch second but differ in sub-second order
    -- (ADVICE.md round 2; collisions grow with scale factor).
    SELECT user_id, {_EPOCH} AS ts_epoch, event_id,
           CASE WHEN {_EPOCH}
                     - lag({_EPOCH}) OVER (PARTITION BY user_id
                                           ORDER BY {_EPOCH} ASC, event_id ASC)
                     > 1800
                  OR lag({_EPOCH}) OVER (PARTITION BY user_id
                                         ORDER BY {_EPOCH} ASC, event_id ASC) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts_epoch ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
    FROM flagged
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       min(ts_epoch) AS session_start,
       max(ts_epoch) - min(ts_epoch) AS duration_sec
FROM numbered
GROUP BY user_id, session_idx
""",
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag → new-session
    flag → running sum as session index → per-session aggregate.  The
    batch-exact analogue of ``F.session_window`` (streaming twin in
    ``streaming/twins.py``); duration in epoch seconds, not INTERVAL,
    to keep types portable (SURVEY §7.3)."""
    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_epoch")
    )
    order = Window.partitionBy("user_id").orderBy(F.asc("ts_epoch"), F.asc("event_id"))
    prev = F.lag("ts_epoch").over(order)
    flagged = e.withColumn(
        "is_new",
        (prev.isNull() | ((F.col("ts_epoch") - prev) > 1800)).cast("int"),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_epoch").alias("session_start"),
        (F.max("ts_epoch") - F.min("ts_epoch")).alias("duration_sec"),
    )


@register(
    "q_late_data_filter",
    oracle=f"""
SELECT event_id, user_id, event_type, {_EPOCH} AS ts_epoch
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
""",
)
def q_late_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics on batch: keep only events within 1 hour of the
    observed max event time — exactly what a ``withWatermark('ts', '1
    hour')`` stream would still accept at end-of-input.  The max is a
    scalar-subquery aggregate (broadcast to the filter), not a driver
    collect."""
    e = load_events(spark, sf_dir)
    max_ts = e.select(F.max("ts").alias("m"))
    return (
        e.join(F.broadcast(max_ts))
        .where(F.col("ts") >= F.col("m") - F.expr("INTERVAL 1 HOUR"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
    )


@register(
    "q_stateful_dedup_events",
    oracle=f"""
SELECT event_id, user_id, event_type, {_EPOCH} AS ts_epoch
FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                                   ORDER BY ts ASC, user_id ASC) AS rn
      FROM events)
WHERE rn = 1
""",
)
def q_stateful_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed deduplication — the batch analogue of streaming
    ``dropDuplicates(['event_id'])`` state.  Expressed as keep-first
    (earliest ts) per key so the surviving row is deterministic even if
    duplicate event_ids appear (``dropDuplicates`` itself keeps an
    arbitrary row — not oracle-safe)."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("event_id").orderBy(F.asc("ts"), F.asc("user_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
    )


@register(
    "q_events_funnel",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): per user, the
    earliest view, the earliest click AFTER that view, the earliest
    purchase AFTER that click, and the stage reached — the sequential
    constraint is what separates a funnel from three independent mins
    (a click before the first view doesn't count).

    Scale shape: each stage is one filtered aggregate joined back on
    user_id — three shuffles keyed on the natural key, no window over the
    raw stream and no per-user event sorting; the event table scans once
    per stage with the type filter pushed down.
    """
    events = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    users = events.select("user_id").distinct()
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_stage"),
        )
    )


@register(
    "q_events_retention",
    oracle="""
WITH firsts AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
    FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS INTEGER)
           AS weeks_since,
       count(*) AS n_users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY 1, 2
""",
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in
    every later week they return — the retention-matrix query behind
    every growth dashboard.  Week arithmetic is kept engine-portable by
    construction: both sides truncate to the same Monday, so the day
    difference is an exact multiple of 7 and integer-divides cleanly
    (DuckDB's date_diff('week') counts boundary crossings and would NOT
    match a /7 — avoided on both sides).

    Scale shape: two aggregates over the event stream (first-touch and
    distinct activity weeks, both shuffled on user_id — AQE can reuse
    the exchange) joined on user_id, then a cohort-sized final group-by.
    """
    events = load_events(spark, sf_dir).select("user_id", "ts")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_events_anomaly",
    oracle=f"""
WITH hourly AS (
    SELECT {_EPOCH} - {_EPOCH} % 3600 AS bucket_start,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
),
stats AS (
    SELECT event_type,
           avg(n_events) AS mean_n,
           stddev_samp(n_events) AS sd_n
    FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.bucket_start, h.n_events,
       round((h.n_events - s.mean_n) / s.sd_n, 4) + 0.0 AS zscore
FROM hourly h
JOIN stats s ON s.event_type = h.event_type
WHERE s.sd_n > 0
  AND abs((h.n_events - s.mean_n) / s.sd_n) >= 2.5
""",
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection over the event stream: hourly counts per
    event type z-scored against that type's own hourly distribution; rows
    with |z| ≥ 2.5 are the alerts a monitoring pipeline pages on.

    Two aggregations — hourly buckets (time-range × type cardinality,
    never row-scale state) and a per-type mean/stddev over those buckets —
    then a broadcast join back.  Counts are integers, so the aggregates
    are exact in both engines; the z-score rounds at 4 only for display.
    """
    e = load_events(spark, sf_dir)
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
        )
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n_events").alias("mean_n"),
        F.stddev_samp("n_events").alias("sd_n"),
    )
    z = (F.col("n_events") - F.col("mean_n")) / F.col("sd_n")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .where((F.col("sd_n") > 0) & (F.abs(z) >= 2.5))
        .select(
            "event_type",
            "bucket_start",
            "n_events",
            _round4(z).alias("zscore"),
        )
    )


# Shared by the batch query below AND its streaming-executed twin
# (streaming/queries.py q_stream_scd2_exec) — one definition so the two
# graded executions cannot silently diverge (code-review r6 precedent).
SCD2_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER w AS prev_type
    FROM events
    WHERE user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
runs AS (
    SELECT user_id, event_type, ts, event_id,
           sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_id
    FROM ordered
),
compacted AS (
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type AS status,
           min(ts) AS from_ts, count(*) AS n_events
    FROM runs
    GROUP BY user_id, run_id, event_type
)
SELECT user_id, run_id, status,
       CAST(floor(epoch(from_ts)) AS BIGINT) AS valid_from_s,
       CAST(floor(epoch(lead(from_ts) OVER w2)) AS BIGINT) AS valid_to_s,
       lead(from_ts) OVER w2 IS NULL AS is_current,
       n_events
FROM compacted
WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id ASC)
"""


@register("q_events_scd2", oracle=SCD2_ORACLE)
def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC → SCD2 dimension compaction: treat the event stream as a change
    log of each user's "status" (their event_type) and collapse
    consecutive runs of the same status into validity intervals —
    ``(user_id, status, valid_from, valid_to, is_current)`` — the
    slowly-changing-dimension type-2 build every warehouse maintains
    from a change stream.

    The classic two-window formulation: ``lag`` marks change points, a
    running sum over the marks numbers the runs (gaps-and-islands), a
    run-keyed aggregate takes each run's first timestamp, and ``lead``
    over the compacted runs closes each interval with the next run's
    start (NULL ⇒ the current row).  Ordering is made total with the
    (ts, event_id) tie-break, so every run boundary — and therefore
    every output row — is deterministic on both engines.  Timestamps
    surface as epoch SECONDS (module convention: integer hashing is
    engine-portable where raw timestamp hashing is not); run boundaries
    are computed on the FULL-precision timestamps before projection.
    NULL user_id rows are excluded on both sides (an unkeyed change
    belongs to no dimension row; same rule as q_skew_profile).

    Scale shape (100 TB of events): both windows and the run aggregate
    partition by user_id — ONE shuffle on the dimension key, then
    linear in-partition scans; the compacted relation lead() reads is
    runs-sized (≪ events).  This is the same partition-local gaps-and-
    islands shape as q_window_session, and it streams: the stateful
    twin would be applyInPandasWithState keyed on user_id.
    """
    e = load_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    marked = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    runs = marked.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    compacted = runs.groupBy("user_id", "run_id", F.col("event_type").alias("status")).agg(
        F.min("ts").alias("from_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy(F.asc("run_id"))
    nxt = F.lead("from_ts").over(w2)
    return compacted.select(
        "user_id",
        F.col("run_id").cast("long").alias("run_id"),
        "status",
        F.unix_timestamp("from_ts").alias("valid_from_s"),
        F.unix_timestamp(nxt).alias("valid_to_s"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )
