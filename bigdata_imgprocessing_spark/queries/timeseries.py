"""Time-window & temporal-join surface (SURVEY.md §2.10 extension).

The reference has no time semantics at all; the driver's ``events`` table
plus the north-star ("design for 100 TB") make batch time-windows,
sessionization, and temporal joins first-class here. All bucket outputs
are formatted at second-or-coarser granularity: the parquet source is
TIMESTAMP(NANOS) which Spark truncates to µs while DuckDB keeps ns, and
flooring to seconds is the provably truncation-safe comparison level.

Scale notes: tumbling/sliding windows are pure map-side bucket columns +
one grouped-agg shuffle; session windows shuffle once on user_id;
the as-of join is the single-shuffle union-merge operator; the range
join is an equi hash join on user_id with a residual time predicate
(never a cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.catalog import table
from ..core.registry import query
from ..core.session import ensure_utc
from ..functions.helpers import ordered_fold_sum
from ..operators.asof import asof_join


@query(
    "time_bucket_agg",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY day, event_type
    """,
)
def time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window via native ``window()`` (Structured-Streaming
    compatible — same expression works under readStream + watermark)."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "sliding_window_agg",
    oracle="""
    SELECT strftime(make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - off) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1800]) AS off) offs
    WHERE (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - off) >= 0
    GROUP BY window_start
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 30 minutes: each event lands in 2
    windows. Oracle reproduces Spark's window set by computing both
    candidate starts (floor-to-30min minus {0, 30min})."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           count(DISTINCT sid) AS n_sessions,
           count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap via native
    ``session_window`` (new session when gap >= 30min; the oracle's
    gaps-and-islands formulation encodes the same boundary)."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    per_session = e.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count("*").alias("cnt")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("cnt").alias("n_events")
    )


@query(
    "asof_purchase_click",
    oracle="""
    WITH m AS (
        SELECT p.event_id, p.user_id, p.ts AS pts, max(c.ts) AS cts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
    )
    SELECT event_id, user_id,
           strftime(cts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
           CAST(floor(epoch(date_trunc('second', pts))) -
                floor(epoch(date_trunc('second', cts))) AS BIGINT) AS secs_since_click
    FROM m
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase matched to the user's most
    recent click at-or-before it (union-merge operator, one shuffle)."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    j = asof_join(purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", payload_cols=[])
    return j.select(
        "event_id",
        "user_id",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")).alias("secs_since_click"),
    )


@query(
    "range_join_funnel",
    oracle="""
    SELECT s.event_id AS signup_id, s.user_id,
           count(p.event_id) AS n_purchases,
           round(coalesce(sum(p.value), 0), 2) AS sum_value
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 DAY
    GROUP BY s.event_id, s.user_id
    """,
)
def range_join_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: purchases within 24h after each signup, per
    signup. Equi hash join on user_id carries the time band as a residual
    predicate — no cross product at any scale."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    s = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("s_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event"), "value",
    )
    cond = (
        (s.user_id == p.p_user)
        & (p.p_ts >= s.s_ts)
        & (p.p_ts < s.s_ts + F.expr("INTERVAL 1 DAY"))
    )
    return (
        s.join(p, cond, "left")
        .groupBy("signup_id", "user_id")
        .agg(
            F.count("p_event").alias("n_purchases"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("sum_value"),
        )
    )


@query(
    "daily_counts_gapfilled",
    oracle="""
    WITH bounds AS (
        SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi
        FROM events
    ),
    days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
    ),
    daily AS (
        SELECT date_trunc('day', ts) AS d, count(*) AS c
        FROM events WHERE event_type = 'error' GROUP BY d
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           coalesce(daily.c, 0) AS n_errors
    FROM days LEFT JOIN daily ON days.d = daily.d
    """,
)
def daily_counts_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: generate the full day series between min and
    max event time (sequence() of dates — a generated time dimension,
    no driver loop), left join the sparse daily counts, zero-fill.
    Days with no 'error' events appear with 0."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    daily = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("c"))
    )
    return days.join(daily, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("c", F.lit(0)).alias("n_errors"),
    )


@query(
    "event_transition_counts",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type, count(*) AS n_transitions
    FROM o WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix of user event sequences (lag over a
    per-user total order, then one grouped count). Ordering is
    (epoch-second, event_id) so it is total and identical in both
    engines regardless of sub-second timestamp precision (Spark reads
    the nanos column truncated to µs, DuckDB keeps ns — second
    granularity sidesteps that, per the determinism contract)."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_timestamp("ts"), "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_transitions"))
    )


@query(
    "range_window_counts",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS sec
        FROM events
    ),
    w AS (
        SELECT user_id, event_id,
               count(*) OVER (PARTITION BY user_id ORDER BY sec
                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                   AS n_last_hour
        FROM e
    )
    SELECT n_last_hour AS burst_size, count(*) AS n_events
    FROM w GROUP BY burst_size
    """,
)
def range_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based frame, not row-based): for every
    event, how many events the same user produced in the preceding hour
    INCLUDING simultaneous ones — rowsBetween can't express this because
    ties at the frame edge must all enter the frame. Histogrammed by
    burst size (a rate-limiting / burst-detection signal). One (user)
    window shuffle + one tiny histogram shuffle; the frame is bounded
    (1h) so window state stays O(events-per-hour-per-user) at any
    corpus size."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp(F.date_trunc("second", "ts")).alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    counted = e.select("user_id", F.count("*").over(w).alias("burst_size"))
    return counted.groupBy("burst_size").agg(F.count("*").alias("n_events"))


@query(
    "funnel_conversion_stats",
    oracle="""
    WITH steps AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'view') AS t_view,
               min(ts) FILTER (WHERE event_type = 'click') AS t_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id
    ),
    flags AS (
        SELECT user_id,
               (t_view IS NOT NULL) AS s1,
               (t_view IS NOT NULL AND t_click IS NOT NULL
                AND t_click > t_view) AS s2,
               (t_view IS NOT NULL AND t_click IS NOT NULL
                AND t_click > t_view AND t_purchase IS NOT NULL
                AND t_purchase > t_click) AS s3
        FROM steps
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel,
           round(sum(CASE WHEN s3 THEN 1 ELSE 0 END) * 1.0
                 / sum(CASE WHEN s1 THEN 1 ELSE 0 END), 4) AS conversion
    FROM flags
    """,
)
def funnel_conversion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered k-step funnel (view → click → purchase): a user converts
    a step only if their FIRST occurrence of it is strictly after the
    first occurrence of the previous step — the standard product-
    analytics funnel, computed with first-touch semantics so it needs no
    per-user event ordering beyond three conditional mins.

    Plan at scale: ONE shuffle on user_id with map-side partial
    conditional mins (no window, no per-user sort, no event-sequence
    explode — the funnel depth only adds aggregate columns, not
    passes); the final counts collapse a per-user frame to one row."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    steps = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    return steps.agg(
        F.count("*").alias("n_users"),
        F.sum(s1.cast("long")).alias("n_view"),
        F.sum(s2.cast("long")).alias("n_view_click"),
        F.sum(s3.cast("long")).alias("n_full_funnel"),
        F.round(F.sum(s3.cast("long")) / F.sum(s1.cast("long")), 4).alias("conversion"),
    )


@query(
    "locf_daily_values",
    oracle="""
    WITH bounds AS (
        SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi
        FROM events
    ),
    days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
    ),
    users AS (SELECT DISTINCT user_id FROM events WHERE user_id % 50 = 0),
    daily AS (
        SELECT user_id, d, v FROM (
            SELECT user_id, date_trunc('day', ts) AS d, value AS v,
                   row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE user_id % 50 = 0
        ) WHERE rn = 1
    ),
    grid AS (
        SELECT u.user_id, days.d, daily.v
        FROM users u CROSS JOIN days
        LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = days.d
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
           round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled
    FROM grid
    """,
)
def locf_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: each sampled user's latest
    daily reading, forward-filled over the full calendar (null until the
    first observation) — THE standard time-series imputation for sensor
    / metric feeds. The daily last-reading is max_by over the unique
    (ts, event_id) order, the user×day grid comes from a generated
    calendar crossed with the sampled user dim (both broadcast-sized),
    and the fill itself is ``last(ignorenulls)`` over an unbounded
    preceding frame — one window shuffle partitioned by user, which at
    100 TB is exactly one pass per key after the calendar join."""
    all_events = table(spark, sf_dir, "events")
    e = all_events.where(F.col("user_id") % 50 == 0)
    # cached: the (sampled-user x day)-bounded daily frame feeds both
    # the grid join and the user dim — deriving users from the raw
    # filtered scan re-planned the events scan a third time (r8
    # scan-dedup audit; 2 scans remain — sampled pass + global bounds).
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("v")).cache()
    # Calendar bounds deliberately come from the UNFILTERED table: the
    # fill grid is the global observation window, not the sampled
    # users' window (which could be narrower on sparser data).
    bounds = all_events.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    users = daily.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(days)).join(
        daily, ["user_id", "d"], "left"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(F.last("v", ignorenulls=True).over(w), 2).alias("filled"),
    )


@query(
    "scd2_user_history",
    oracle="""
    WITH h AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS vf,
               lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
               ) AS vt
        FROM events WHERE user_id % 25 = 0
    )
    SELECT event_type,
           count(*) AS n_versions,
           CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
           CAST(sum(vt - vf) AS BIGINT) AS total_duration_sec
    FROM h GROUP BY event_type
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build — the warehouse op that
    turns an event feed into validity intervals: each user event opens a
    version valid [its ts, next event's ts), the last version per user
    stays open (the SCD2 "current" row). One window shuffle partitioned
    by the dimension key computes every interval (lead over the
    (epoch-second, event_id) total order — the events determinism
    contract), then a per-type rollup audits version counts, open rows,
    and total validity duration. At 100 TB this is the daily dimension
    rebuild: one shuffle by key, no self-join (the naive
    "join each row to its successor" doubles the shuffle and explodes
    on hot keys); incremental maintenance would MERGE the newest
    partition's rows against current versions (streaming/upsert.py is
    that path's demo)."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    w = Window.partitionBy("user_id").orderBy("vf", "event_id")
    h = e.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").alias("vf"),
    ).withColumn("vt", F.lead("vf").over(w))
    return h.groupBy("event_type").agg(
        F.count("*").alias("n_versions"),
        F.sum(F.col("vt").isNull().cast("long")).alias("n_current"),
        F.sum(F.col("vt") - F.col("vf")).alias("total_duration_sec"),
    )


def _fan_7day_windows(df, mx):
    """Fan each (…, d) row out to the ≤7 daily window-ends [d, d+6] it
    belongs to, clipped at the corpus max day (1-row broadcast bound).
    Shared by the exact and sketch forms of the rolling-distinct metric
    so the window semantics live in exactly one place."""
    return (
        df.select(
            "*",
            F.explode(
                F.sequence(
                    "d",
                    F.col("d") + F.expr("INTERVAL 6 DAY"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("we"),
        )
        .crossJoin(F.broadcast(mx))
        .where(F.col("we") <= F.col("mx"))
        .drop("d", "mx")
    )


@query(
    "sliding_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), b AS (
        SELECT max(date_trunc('day', ts)) AS mx FROM events
    ), fan AS (
        SELECT DISTINCT user_id,
               d + to_days(CAST(i AS INTEGER)) AS we
        FROM ud, UNNEST(range(7)) AS t(i), b
        WHERE d + to_days(CAST(i AS INTEGER)) <= b.mx
    )
    SELECT strftime(we, '%Y-%m-%d') AS day, count(*) AS n_users
    FROM fan GROUP BY we
    """,
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the DAU/WAU-style
    metric whose aggregate (COUNT DISTINCT) is NOT sum-decomposable
    across sliding windows, so a plain sliding sum of daily counts
    over-counts returning users. The scalable exact form used here:
    collapse the raw stream to distinct (user, day) pairs FIRST (one
    shuffle with map-side partial distinct — events:(user,day) is the
    heavy reduction), then fan each pair out to the ≤7 window-ends it
    belongs to (bounded, k× the already-tiny pair set), re-distinct on
    (window, user), and count per window. At 100 TB the alternative —
    a range self-join or collect_set window over raw events — shuffles
    the full stream per window; this shuffles only user-day pairs.
    Trailing partial windows past max(day) are clipped (1-row
    broadcast bound); leading windows are naturally partial, as the
    metric's consumers expect."""
    from ..core.session import cache_parallelism

    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    # cache(): the distinct pairs feed the fan-out AND the max-day bound
    # (derived from the pairs, not a second corpus scan).
    ud = (
        e.select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .coalesce(cache_parallelism(spark))
        .cache()
    )
    mx = ud.agg(F.max("d").alias("mx"))
    fan = _fan_7day_windows(ud, mx).distinct()
    return fan.groupBy("we").agg(F.count("*").alias("n_users")).select(
        F.date_format("we", "yyyy-MM-dd").alias("day"), "n_users"
    )


@query(
    "cohort_retention",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), first_seen AS (
        SELECT user_id, min(d) AS cd FROM ud GROUP BY user_id
    ), sized AS (
        SELECT cd, count(*) AS n_cohort FROM first_seen GROUP BY cd
    ), act AS (
        SELECT f.cd, CAST(date_diff('day', f.cd, u.d) AS BIGINT) AS offset_d,
               u.user_id
        FROM ud u JOIN first_seen f USING (user_id)
        WHERE date_diff('day', f.cd, u.d) <= 13
    )
    SELECT strftime(a.cd, '%Y-%m-%d') AS cohort_day, a.offset_d,
           count(*) AS n_active,
           round(count(*) * 1.0 / s.n_cohort, 4) AS retention
    FROM act a JOIN sized s USING (cd)
    GROUP BY a.cd, a.offset_d, s.n_cohort
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by first-seen day, and for each (cohort, day-offset ≤ 13)
    the count and fraction of the cohort active that day. Day-0
    retention is 1.0 by construction (a free self-check the oracle
    hash covers).

    Scale (single-scan shape): the raw stream collapses to distinct
    (user, day) pairs in one shuffle (map-side partial distinct); the
    first-seen day comes from a min() WINDOW over the user partition —
    not a self-join back onto the pairs, which would scan and shuffle
    the stream twice (the first draft did; the plan audit caught it).
    Because every user is active on their own day 0, the cohort size
    IS the offset-0 count, so the denominator is a window max over the
    already-tiny (cohort × offset) count matrix instead of another
    join. Three data-sized exchanges total, one corpus scan."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    uw = Window.partitionBy("user_id")
    act = (
        ud.withColumn("cd", F.min("d").over(uw))
        .select(
            "cd", F.datediff("d", "cd").cast("long").alias("offset_d")
        )
        .where(F.col("offset_d") <= 13)
    )
    counts = act.groupBy("cd", "offset_d").agg(F.count("*").alias("n_active"))
    cw = Window.partitionBy("cd")
    n_cohort = F.max(
        F.when(F.col("offset_d") == 0, F.col("n_active"))
    ).over(cw)
    return counts.select(
        F.date_format("cd", "yyyy-MM-dd").alias("cohort_day"),
        "offset_d",
        "n_active",
        F.round(F.col("n_active") * F.lit(1.0) / n_cohort, 4).alias(
            "retention"
        ),
    )


def _rolling_sketch_audit(ud, daily_sk):
    """Shared audit tail of the mergeable-sketch rolling-distinct metric
    (batch ``sliding_users_sketch`` and streaming
    ``streaming_sketch_rollup``): per-window HLL union-estimate joined
    to the exact fan-out count, emitting the 5%-tolerance boolean the
    hash pins. Single-sourced so the window semantics and the tolerance
    contract cannot diverge between the twins."""
    mx = ud.agg(F.max("d").alias("mx"))
    est = (
        _fan_7day_windows(daily_sk, mx)
        .groupBy("we")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = (
        _fan_7day_windows(ud, mx)
        .distinct()
        .groupBy("we")
        .agg(F.count("*").alias("n_exact"))
    )
    return exact.join(est, "we").select(
        F.date_format("we", "yyyy-MM-dd").alias("day"),
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_tol"),
    )


@query(
    "sliding_users_sketch",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), b AS (
        SELECT max(date_trunc('day', ts)) AS mx FROM events
    ), fan AS (
        SELECT DISTINCT user_id,
               d + to_days(CAST(i AS INTEGER)) AS we
        FROM ud, UNNEST(range(7)) AS t(i), b
        WHERE d + to_days(CAST(i AS INTEGER)) <= b.mx
    )
    SELECT strftime(we, '%Y-%m-%d') AS day, count(*) AS n_exact,
           TRUE AS within_tol
    FROM fan GROUP BY we
    """,
)
def sliding_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE-SKETCH form of the rolling 7-day distinct-users
    metric: one HLL sketch per day (`hll_sketch_agg`), rolling value =
    `hll_union_agg` of the 7 daily sketches, estimated with
    `hll_sketch_estimate` — the 100 TB shape, because yesterday's
    sketches are immutable kilobyte-sized state that NEVER re-scans
    raw events (the exact fan-out in ``sliding_distinct_users``
    re-shuffles the user-day pairs every day; this re-merges 7 tiny
    sketches). The exact value is computed alongside and the checked
    hash pins ``within_tol`` (|est − exact| ≤ 5% of exact, comfortably
    above HLL lgk=12's ~1.6% rse) to TRUE per window — same
    audit-the-sketch contract as ``approx_sketch_stats``; the raw
    estimate itself is engine-specific and deliberately not emitted."""
    from ..core.session import cache_parallelism

    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    # cache(): the pairs feed the sketch path, the exact path, and the
    # max-day bound — one corpus scan instead of three.
    ud = (
        e.select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .coalesce(cache_parallelism(spark))
        .cache()
    )
    daily_sk = ud.groupBy("d").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return _rolling_sketch_audit(ud, daily_sk)


@query(
    "recursive_calendar_revenue",
    oracle="""
    WITH RECURSIVE bounds AS (
        SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
               CAST(max(date_trunc('day', ts)) AS DATE) AS hi
        FROM events
    ),
    seg(d0, len) AS (
        SELECT lo, date_diff('day', lo, hi) + 1 FROM bounds
        UNION ALL
        SELECT CASE WHEN part = 0 THEN d0 ELSE d0 + CAST(len // 2 AS INTEGER) END,
               CASE WHEN part = 0 THEN len // 2 ELSE len - len // 2 END
        FROM seg CROSS JOIN (SELECT unnest([0, 1]) AS part) p
        WHERE len > 1
    ),
    days AS (SELECT d0 AS d FROM seg WHERE len = 1),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               count(*) AS c, round(sum(value), 2) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY d
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           coalesce(daily.c, 0) AS n_purchases,
           coalesce(daily.rev, 0.0) AS revenue
    FROM days LEFT JOIN daily ON days.d = daily.d
    """,
)
def recursive_calendar_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (``WITH RECURSIVE`` — the Spark-4 iterative-SQL
    surface): the gap-fill calendar is generated by SEGMENT-HALVING
    recursion — the seed is the whole [lo, hi] span with its length,
    each step splits every longer-than-one segment into two halves, and
    the unit segments ARE the days. Depth is O(log span) instead of the
    one-iteration-per-day linear form (each recursion step is a
    materialization barrier, so a year-long calendar costs ~9 steps
    rather than 365 — measured 6.3s → ~1.5s at the 30-day span, and the
    gap only widens with the span). Sparse daily purchase revenue
    left-joins in with zero-fill; DuckDB runs the same halving
    recursion in the oracle.

    Scope note (measured, not assumed): Spark's recursion supports
    UNION ALL only (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) and ONE
    reference to the recursive table per step — hence the 2-row
    CROSS JOIN split instead of a two-branch union — so cyclic
    transitive closures still need the pointer-jumping operator
    (operators/components.py); recursion fits acyclic bounded-depth
    generation like this calendar."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
                   CAST(max(date_trunc('day', ts)) AS DATE) AS hi
            FROM {e}
        ),
        seg(d0, len) AS (
            SELECT lo, CAST(datediff(hi, lo) + 1 AS BIGINT) FROM bounds
            UNION ALL
            SELECT CASE WHEN part = 0 THEN d0
                        ELSE date_add(d0, CAST(len DIV 2 AS INT)) END,
                   CASE WHEN part = 0 THEN len DIV 2
                        ELSE len - len DIV 2 END
            FROM seg CROSS JOIN (SELECT 0 AS part UNION ALL SELECT 1) p
            WHERE len > 1
        ),
        days AS (SELECT d0 AS d FROM seg WHERE len = 1),
        daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                   count(*) AS c, round(sum(value), 2) AS rev
            FROM {e} WHERE event_type = 'purchase' GROUP BY d
        )
        SELECT date_format(days.d, 'yyyy-MM-dd') AS day,
               coalesce(daily.c, 0) AS n_purchases,
               coalesce(daily.rev, 0.0) AS revenue
        FROM days LEFT JOIN daily ON days.d = daily.d
        """,
        e=e,
    )


@query(
    "pit_join_features",
    oracle="""
    WITH dim AS (
        SELECT user_id,
               value AS feature,
               CAST(floor(epoch(ts)) AS BIGINT) AS vf,
               lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
               ) AS vt
        FROM events WHERE user_id % 25 = 0 AND event_type = 'click'
    ),
    facts AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
        FROM events WHERE user_id % 25 = 0 AND event_type = 'purchase'
    )
    SELECT f.purchase_id, f.user_id,
           d.feature,
           d.vf AS feature_as_of,
           d.feature IS NOT NULL AS has_feature
    FROM facts f LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND f.p_ts >= d.vf
     AND (d.vt IS NULL OR f.p_ts < d.vt)
    """,
)
def pit_join_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join — the feature-store correctness pattern: each
    fact (purchase) joins the feature VERSION that was valid at the
    fact's own timestamp (the click-stream value as an SCD2 dimension,
    same interval build as ``scd2_user_history``), never a later one —
    the train-time leakage a naive latest-value join causes. Purchases
    before any version keep a NULL feature (left join — the cold-start
    row the training pipeline must see, not silently drop).

    Uniqueness by construction: versions partition each user's
    timeline ([vf, vt) half-open, lead over the (epoch-second,
    event_id) total order; same-second versions produce empty
    intervals), so every fact matches at most one version and the
    output is exactly one row per fact.

    Scale: one window shuffle builds the dimension, then a single
    user-keyed interval join — at warehouse scale the dim is
    range-partitioned by (key, vf) and the join stays key-local; no
    per-fact subquery, no latest-snapshot shortcut."""
    ensure_utc(spark)
    sampled = table(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    secs = F.floor(F.unix_timestamp("ts")).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("vf", "event_id")
    dim = (
        sampled.where(F.col("event_type") == "click")
        .select(
            "user_id", F.col("value").alias("feature"),
            secs.alias("vf"), "event_id",
        )
        .withColumn("vt", F.lead("vf").over(w))
        .drop("event_id")
    )
    facts = sampled.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        secs.alias("p_ts"),
    )
    d = dim.alias("d")
    f = facts.alias("f")
    joined = f.join(
        d,
        (F.col("d.user_id") == F.col("f.user_id"))
        & (F.col("f.p_ts") >= F.col("d.vf"))
        & (F.col("d.vt").isNull() | (F.col("f.p_ts") < F.col("d.vt"))),
        "left",
    )
    return joined.select(
        "purchase_id",
        F.col("f.user_id").alias("user_id"),
        "feature",
        F.col("d.vf").alias("feature_as_of"),
        F.col("feature").isNotNull().alias("has_feature"),
    )


@query(
    "session_funnel_stats",
    oracle="""
    WITH b AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS es
        FROM events
    ),
    l AS (
        SELECT *, CASE WHEN es - lag(es) OVER (PARTITION BY user_id
                                               ORDER BY es, event_id) >= 1800
                       THEN 1 ELSE 0 END AS ni
        FROM b
    ),
    s AS (
        SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY es, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM l
    ),
    w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN es END)
                         OVER (PARTITION BY user_id, sid) AS s1 FROM s),
    w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND es >= s1
                              THEN es END)
                         OVER (PARTITION BY user_id, sid) AS s2 FROM w1),
    w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND es >= s2
                              THEN es END)
                         OVER (PARTITION BY user_id, sid) AS s3 FROM w2),
    per AS (
        SELECT user_id, sid,
               max(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS f1,
               max(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END) AS f2,
               max(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END) AS f3
        FROM w3 GROUP BY user_id, sid
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(f1) AS BIGINT) AS n_view,
           CAST(sum(f2) AS BIGINT) AS n_view_click,
           CAST(sum(f3) AS BIGINT) AS n_full_funnel
    FROM per
    """,
)
def session_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized STRICT-SEQUENTIAL funnel (MATCH_RECOGNIZE-lite):
    within each 30-min-gap session, stage 2 is the first click AT OR
    AFTER the session's first view and stage 3 the first purchase at or
    after that click — unlike ``funnel_conversion_stats`` (user-level,
    first-touch), an out-of-order click before any view does NOT count.
    The stage chain is three CHAINED session-partitioned window mins
    (each stage's anchor is a session-constant column the next window's
    predicate reads) — no self-join, no sequence explode, and because
    (user, sid) refines the user partitioning, ALL windows plus the
    per-session rollup share ONE shuffle. Epoch-second integers
    end-to-end (the pit-join parity pattern); ties are totally ordered
    by (es, event_id) so session ids are deterministic cross-engine."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    base = e.select(
        "user_id", "event_id", "event_type", F.col("ts").cast("long").alias("es")
    )
    wl = Window.partitionBy("user_id").orderBy("es", "event_id")
    ni = F.when(F.col("es") - F.lag("es").over(wl) >= 1800, 1).otherwise(0)
    wc = wl.rowsBetween(Window.unboundedPreceding, 0)
    t = base.withColumn("sid", F.sum(ni).over(wc))
    ws = Window.partitionBy("user_id", "sid")
    t = t.withColumn(
        "s1", F.min(F.when(F.col("event_type") == "view", F.col("es"))).over(ws)
    )
    t = t.withColumn(
        "s2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("es") >= F.col("s1")),
                F.col("es"),
            )
        ).over(ws),
    )
    t = t.withColumn(
        "s3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("es") >= F.col("s2")),
                F.col("es"),
            )
        ).over(ws),
    )
    per = t.groupBy("user_id", "sid").agg(
        F.max(F.col("s1").isNotNull().cast("int")).alias("f1"),
        F.max(F.col("s2").isNotNull().cast("int")).alias("f2"),
        F.max(F.col("s3").isNotNull().cast("int")).alias("f3"),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.sum("f1").cast("bigint").alias("n_view"),
        F.sum("f2").cast("bigint").alias("n_view_click"),
        F.sum("f3").cast("bigint").alias("n_full_funnel"),
    )


@query(
    "attribution_touchpoints",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts, value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, event_id AS teid, ts AS tts, event_type AS tt
        FROM events WHERE event_type != 'purchase'
    ), j AS (
        SELECT p.pid, p.value, t.tt, epoch_us(t.tts) AS tus, t.teid
        FROM p JOIN t ON t.user_id = p.user_id
                     AND t.tts < p.pts
                     AND t.tts >= p.pts - INTERVAL 7 DAY
    ), r AS (
        SELECT pid, value, tt,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY tus, teid) AS rf,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY tus DESC, teid DESC) AS rl
        FROM j
    )
    SELECT tt AS touch_type,
           CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first,
           round(sum(CASE WHEN rf = 1 THEN value ELSE 0 END), 2)
               AS first_touch_value,
           CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_last,
           round(sum(CASE WHEN rl = 1 THEN value ELSE 0 END), 2)
               AS last_touch_value
    FROM r GROUP BY tt
    """,
)
def attribution_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style FIRST-touch vs LAST-touch attribution: each
    purchase's value is credited to the type of the user's earliest
    and latest non-purchase event in the 7 days before it, rolled up
    per touch type — the two bookend models whose per-channel gap
    (first >> last: discovery channel; last >> first: closer channel)
    is the report's actual signal.

    Shape: a band join (equi on user_id, time band as residual — the
    `range_join_funnel` pattern, no cross product) followed by
    purchase-keyed rank windows. First/last selection orders by exact
    (epoch-microseconds, event_id) — a total order identical in both
    engines, so boundary ties can't flip attribution (the events
    determinism contract). Attributed value sums are 2-decimal grid
    values summed THEN rounded once (grid-sum rule).

    Scale: one user-keyed shuffle for the join, one purchase-keyed
    window pass; windows partition by purchase id (never global); the
    7-day band bounds per-purchase fan-in, so state is
    touches-per-user-week, not corpus-sized."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        "value",
    )
    t = e.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("teid"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("tt"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    ).select(
        "pid", "value", "tt", F.unix_micros("tts").alias("tus"), "teid"
    )
    wf = Window.partitionBy("pid").orderBy("tus", "teid")
    wl = Window.partitionBy("pid").orderBy(
        F.col("tus").desc(), F.col("teid").desc()
    )
    r = j.select(
        "value",
        "tt",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    first = F.col("rf") == 1
    last = F.col("rl") == 1
    return r.groupBy(F.col("tt").alias("touch_type")).agg(
        F.sum(first.cast("long")).alias("n_first"),
        F.round(
            F.sum(F.when(first, F.col("value")).otherwise(F.lit(0.0))), 2
        ).alias("first_touch_value"),
        F.sum(last.cast("long")).alias("n_last"),
        F.round(
            F.sum(F.when(last, F.col("value")).otherwise(F.lit(0.0))), 2
        ).alias("last_touch_value"),
    )


@query(
    "seasonal_naive_mase",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, sum(o_totalprice) AS rev
        FROM orders GROUP BY o_orderdate
    ),
    seas AS (
        SELECT a.day, abs(a.rev - b.rev) AS err
        FROM daily a JOIN daily b ON b.day = a.day - INTERVAL 7 DAY
    ),
    naiv AS (
        SELECT day,
               abs(rev - lag(rev) OVER (ORDER BY day)) AS err
        FROM daily
    ),
    y AS (
        SELECT CAST(EXTRACT(year FROM s.day) AS BIGINT) AS year,
               count(*) AS n_days,
               sum(s.err) AS se,
               sum(n.err) AS ne
        FROM seas s JOIN naiv n USING (day)
        WHERE n.err IS NOT NULL
        GROUP BY 1
    )
    SELECT year, CAST(n_days AS BIGINT) AS n_eval_days,
           round(se, 2) AS sum_abs_err_seasonal,
           round(ne, 2) AS sum_abs_err_naive,
           CASE WHEN ne <> 0 THEN round(se / ne, 4) END AS mase
    FROM y
    """,
)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation — the genre the monitoring family
    (PSI/KS/CUSUM drift) doesn't cover: per year, the MASE-style ratio
    of the SEASONAL-naive forecast's error (predict each day's revenue
    with the revenue 7 days earlier) to the plain naive forecast's
    error (previous existing day) over daily order revenue. MASE < 1
    means weekly seasonality carries real signal; it is the standard
    sanity bar any forecasting model must beat before it earns compute.
    Eval days are those with BOTH a lag-7 calendar match and a
    previous-day error (inner joins — deterministic in both engines);
    error sums are sums of grid-valued daily revenues (safe to round
    once, the grid-sum rule), and the ratio divides the UNROUNDED sums
    so both engines round the identical double.

    Scale: one fact scan into a per-day partial-sum aggregate (the
    shuffle carries |days| rows, not orders), then self-joins and a
    window over the tiny daily spine — nothing order-sized crosses a
    second shuffle."""
    ensure_utc(spark)
    o = table(spark, sf_dir, "orders")
    # cached (r15): the lag-7 self-join's two sides and the naive lag
    # branch each re-ran the fact groupBy otherwise (3 orders scans in
    # the plan audit; 1 now) — same fix as the _daily_cents helper
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .coalesce(1)
        .cache()
    )
    a = daily.alias("a")
    b = daily.alias("b")
    seas = a.join(
        b, F.col("b.day") == F.date_sub(F.col("a.day"), 7)
    ).select(
        F.col("a.day").alias("day"),
        F.abs(F.col("a.rev") - F.col("b.rev")).alias("err_s"),
    )
    w = Window.orderBy("day")
    naiv = daily.select(
        "day", F.abs(F.col("rev") - F.lag("rev").over(w)).alias("err_n")
    )
    return (
        seas.join(naiv, "day")
        .where(F.col("err_n").isNotNull())
        .groupBy(F.year("day").cast("bigint").alias("year"))
        .agg(
            F.count("*").cast("bigint").alias("n_eval_days"),
            F.round(F.sum("err_s"), 2).alias("sum_abs_err_seasonal"),
            F.round(F.sum("err_n"), 2).alias("sum_abs_err_naive"),
            # Zero-guarded: a year of constant daily revenue makes the
            # naive error sum 0, where Spark/DuckDB division semantics
            # diverge (NULL vs inf); both engines now emit NULL.
            F.when(
                F.sum("err_n") != 0,
                F.round(F.sum("err_s") / F.sum("err_n"), 4),
            ).alias("mase"),
        )
    )


# ---------------------------------------------------------------------------
# OLS trend: closed-form least-squares slope of daily revenue per year —
# the regression member of the eval family (MASE benchmarks forecasts,
# this fits the trend the forecast must beat).
# ---------------------------------------------------------------------------


@query(
    "ols_revenue_trend",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, sum(o_totalprice) AS rev
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT CAST(EXTRACT(year FROM day) AS BIGINT) AS year,
               CAST(datediff('day', (SELECT min(day) FROM daily), day)
                    AS BIGINT) AS x,
               CAST(round(rev * 100) AS BIGINT) AS yc
        FROM daily
    ), s AS (
        SELECT year, count(*) AS n, sum(x) AS sx, sum(yc) AS sy,
               sum(x * yc) AS sxy, sum(x * x) AS sxx
        FROM idx GROUP BY year
    )
    SELECT year, CAST(n AS BIGINT) AS n_days,
           round((n * sxy - sx * sy) * 1.0
                 / (n * sxx - sx * sx) / 100, 6) AS slope_per_day,
           round((sy - (n * sxy - sx * sy) * 1.0
                       / (n * sxx - sx * sx) * sx) / n / 100, 6)
               AS intercept,
           round(sy / n / 100.0, 2) AS mean_daily_rev
    FROM s WHERE n > 1
    """,
)
def ols_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS trend of daily revenue per year — slope and
    intercept from the normal equations over (day-index, revenue)
    pairs: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2). The regression
    member of the forecasting family: ``seasonal_naive_mase``
    benchmarks a forecast, this fits the linear drift the naive
    baselines can't express.

    Float parity: every moment is an exact INT64 — x is the global day
    index, y is daily revenue in CENTS (daily revenue is a grid sum of
    2dp money, so round(rev*100) is exact), and the cross moments
    n*Sxy, Sx*Sy etc. stay far inside int64 at the driver scales
    (bounded in the docstring of the harness: |n*Sxy| <= 4e17 at
    sf0.1). The ONLY divisions happen on bit-identical integer
    operands, so both engines produce the identical double before the
    single terminal round.

    Scale: one fact scan -> per-day partials (the shuffle carries
    |days| rows), the global min-day is a 1-row broadcast, then a
    |years|-row aggregate; nothing order-sized crosses a second
    shuffle."""
    ensure_utc(spark)
    o = table(spark, sf_dir, "orders")
    # cached (r15): the min-day broadcast nested in idx's lineage
    # re-ran the fact groupBy otherwise (plan audit: 2 orders scans;
    # 1 now — the _daily_cents fix, local form since this spine keeps
    # raw rev)
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .coalesce(1)
        .cache()
    )
    mind = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mind)).select(
        F.year("day").cast("bigint").alias("year"),
        F.datediff("day", "d0").cast("bigint").alias("x"),
        F.round(F.col("rev") * 100).cast("bigint").alias("yc"),
    )
    s = idx.groupBy("year").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_c = num * 1.0 / den  # cents/day, identical int operands
    return s.where(F.col("n") > 1).select(
        "year",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(slope_c / 100, 6).alias("slope_per_day"),
        F.round(
            (F.col("sy") - slope_c * F.col("sx")) / F.col("n") / 100, 6
        ).alias("intercept"),
        F.round(F.col("sy") / F.col("n") / 100.0, 2).alias("mean_daily_rev"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier: survival analysis over customer lifetimes — the
# censoring-aware churn curve (a plain churn rate ignores that active
# customers' lifetimes are right-censored).
# ---------------------------------------------------------------------------


@query(
    "kaplan_meier_churn",
    oracle="""
    WITH cust AS (
        SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
        FROM orders GROUP BY o_custkey
    ), obs AS (SELECT max(l) AS te FROM cust),
    j AS (
        SELECT CAST(floor(datediff('day', f, l) / 180) AS INTEGER) AS t,
               CASE WHEN datediff('day', l, (SELECT te FROM obs)) >= 365
                    THEN 1 ELSE 0 END AS churn
        FROM cust
    ), buck AS (
        SELECT t, count(*) AS n_in, sum(churn) AS d FROM j GROUP BY t
    ), risk AS (
        SELECT t, d,
               sum(n_in) OVER (ORDER BY t DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS n_at_risk
        FROM buck
    ), ev AS (
        SELECT t, d, n_at_risk,
               CASE WHEN d < n_at_risk
                    THEN round(ln((n_at_risk - d) * 1.0 / n_at_risk), 6)
               END AS ln6,
               CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END AS ext
        FROM risk WHERE d > 0
    )
    SELECT CAST(t AS INTEGER) AS t_halfyears,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_churned,
           CASE WHEN max(ext) OVER w1 = 1 THEN 0.0
                ELSE round(exp(round(sum(ln6) OVER w1, 6)), 6)
           END AS km_survival
    FROM ev
    WINDOW w1 AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW)
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over customer lifetimes — the
    censoring-aware churn analysis a plain churn-rate query gets
    wrong: a customer still ordering near the corpus end has not
    churned, only a right-censored lifetime, and dropping or counting
    them both bias the curve. Lifetime = first to last order date in
    half-year buckets; churn event = last order >= 365 days before
    the observation end. At each event time t: S(t) = prod over
    t' <= t of (1 - d/n_at_risk), with n_at_risk the standard
    risk set (every customer whose lifetime reaches t').

    Float parity (the ln-to-grid contract, quality.py): each factor is
    the exact int/int division (n-d)/n — bit-identical both engines —
    its libm ln() rounds to the 1e-6 grid before any combination, the
    cumulative SUM of grid values re-rounds at grid precision, and one
    final exp() of bit-identical input is absorbed by the terminal 6dp
    round. A total-extinction step (d = n) would zero the curve; both
    engines pin that case to literal 0.0 before ln() can see it.

    Scale: one fact scan -> per-customer (min, max) partials, plus one
    column-pruned partial-max scan for the observation end (a 1-row
    broadcast; no shuffle, no customer-sized cache — max of per-customer
    maxes = the plain column max); everything after operates on the
    |buckets|-row spine (windows over ~14 rows)."""
    ensure_utc(spark)
    o = table(spark, sf_dir, "orders")
    # r16: the r15 lifetimes cache regressed 29% at 32c (VERDICT r15
    # item 1) — a |customers|-row cache materialization barrier costs
    # more than the scan it saves, and at 100 TB it is a terabyte-class
    # cache entry. The observation end doesn't need the lifetimes at
    # all: max over per-customer max(o_orderdate) IS max(o_orderdate),
    # so `obs` reads the fact directly — a column-pruned partial-max
    # scan with no shuffle — and the lifetimes frame has a single
    # consumer, so nothing is cached. 2 pruned scans, 0 caches.
    cust = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    obs = o.agg(F.max("o_orderdate").alias("te"))
    j = cust.crossJoin(F.broadcast(obs)).select(
        F.floor(F.datediff("l", "f") / 180).cast("int").alias("t"),
        (F.datediff("te", "l") >= 365).cast("int").alias("churn"),
    )
    buck = j.groupBy("t").agg(
        F.count("*").alias("n_in"), F.sum("churn").alias("d")
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = buck.withColumn("n_at_risk", F.sum("n_in").over(w_desc))
    ev = risk.where(F.col("d") > 0).select(
        "t",
        "d",
        "n_at_risk",
        F.when(
            F.col("d") < F.col("n_at_risk"),
            F.round(
                F.log(
                    (F.col("n_at_risk") - F.col("d")) / F.col("n_at_risk")
                ),
                6,
            ),
        ).alias("ln6"),
        (F.col("d") >= F.col("n_at_risk")).cast("int").alias("ext"),
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        F.col("t").alias("t_halfyears"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_churned"),
        F.when(F.max("ext").over(w_asc) == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.round(F.sum("ln6").over(w_asc), 6)), 6)
        )
        .alias("km_survival"),
    )


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared daily-revenue spine: per-day order revenue as exact
    int64 CENTS (the grid-sum rule: 2dp money sums recover exactly
    under round(*100)) — the input every spine-based trend/eval query
    derives from (Theil-Sen, ACF, pinball, runs test, Kendall). ONE
    definition so a change to the cents-grid rule cannot drift across
    queries (each oracle carries the matching `daily` CTE).

    CACHED (r15): every spine consumer that self-joins or broadcasts
    an aggregate of the spine re-evaluated this fact groupBy per
    branch otherwise — the plan audit counted 2-12 orders scans per
    spine query (acf 12, pinball/kendall 4, theilsen 2); one scan
    each now. The frame is calendar-bounded (|days| rows), so a
    1-partition cache is safe at any corpus scale, and the
    CacheManager dedupes by logical plan so repeat calls share one
    entry (NOTES rule 7)."""
    ensure_utc(spark)
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("yc"))
        .coalesce(1)
        .cache()
    )


# ---------------------------------------------------------------------------
# Theil-Sen: median-of-pairwise-slopes robust trend — the robust member
# of the trend family (OLS fits the mean trend; one corrupted day can
# move it arbitrarily, while Theil-Sen tolerates ~29% outliers).
# ---------------------------------------------------------------------------


@query(
    "theilsen_revenue_trend",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS yc
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT CAST(EXTRACT(year FROM day) AS BIGINT) AS year,
               CAST(datediff('day', DATE '1990-01-01', day) AS BIGINT) AS x,
               yc
        FROM daily
    ), pr AS (
        SELECT a.year, (b.yc - a.yc) * 1.0 / (b.x - a.x) AS sl
        FROM idx a JOIN idx b ON b.year = a.year AND b.x > a.x
    ), arr AS (
        SELECT year, list(sl ORDER BY sl) AS ls, count(*) AS m
        FROM pr GROUP BY year
    )
    SELECT year, CAST(m AS BIGINT) AS n_pairs,
           round((ls[CAST((m + 1) // 2 AS INTEGER)]
                  + ls[CAST(m // 2 + 1 AS INTEGER)]) / 2 / 100, 6)
               AS ts_slope_per_day
    FROM arr ORDER BY year
    """,
)
def theilsen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue per year: the median of
    all pairwise slopes (yc_j - yc_i)/(x_j - x_i) over the daily
    spine — the robust companion to ``ols_revenue_trend`` (OLS is the
    BLUE under gaussian noise but a single corrupted day moves it
    arbitrarily; the median-of-slopes estimator has a 29.3% breakdown
    point, the standard robustness monitor for revenue pipelines).

    Float parity: day revenues are exact CENTS (the ols grid-sum
    rule: 2dp money sums recover exactly under round(*100)); every
    slope is one division of bit-identical int64 operands, so the
    slope multiset is bit-identical across engines; the median is an
    EXPLICIT sorted-array selection ((ls[(m+1)/2] + ls[m/2+1]) / 2 —
    the same expression shape both sides) rather than each engine's
    quantile interpolation, so even-count averaging cannot diverge.

    Scale: pairs are generated on the per-YEAR daily spine — a
    calendar-bounded frame (<= 366 rows/year -> <= 66,795 pairs/year)
    whose size is INDEPENDENT of fact rows; the only fact-sized pass
    is the per-day partial aggregation. The per-year slope arrays stay
    under 67k doubles = ~0.5 MB, far below executor memory."""
    daily = _daily_cents(spark, sf_dir)
    idx = daily.select(
        F.year("day").cast("bigint").alias("year"),
        F.datediff("day", F.lit("1990-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        "yc",
    )
    a = idx.alias("a")
    b = idx.alias("b")
    pr = a.join(
        b,
        (F.col("b.year") == F.col("a.year")) & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.year").alias("year"),
        (
            (F.col("b.yc") - F.col("a.yc"))
            * 1.0
            / (F.col("b.x") - F.col("a.x"))
        ).alias("sl"),
    )
    arr = pr.groupBy("year").agg(
        F.sort_array(F.collect_list("sl")).alias("ls"),
        F.count("*").alias("m"),
    )
    lo = F.element_at(
        "ls", ((F.col("m") + 1) / 2).cast("int")
    )
    hi = F.element_at("ls", (F.col("m") / 2 + 1).cast("int"))
    return arr.select(
        "year",
        F.col("m").cast("bigint").alias("n_pairs"),
        F.round((lo + hi) / 2 / 100, 6).alias("ts_slope_per_day"),
    )


# ---------------------------------------------------------------------------
# Log-rank test: two-group survival comparison — the hypothesis-test
# companion to kaplan_meier_churn (KM draws each curve; the log-rank
# asks whether the two curves differ beyond chance).
# ---------------------------------------------------------------------------


@query(
    "logrank_survival_test",
    oracle="""
    WITH cust AS (
        SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
        FROM orders GROUP BY o_custkey
    ), obs AS (SELECT max(l) AS te FROM cust),
    j AS (
        SELECT CAST(floor(datediff('day', f, l) / 180) AS INTEGER) AS t,
               CASE WHEN datediff('day', l, (SELECT te FROM obs)) >= 365
                    THEN 1 ELSE 0 END AS churn,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
        FROM cust JOIN customer c ON c.c_custkey = cust.o_custkey
    ), buck AS (
        SELECT t, count(*) AS n_in, sum(churn) AS d,
               sum(g1) AS n1_in, sum(churn * g1) AS d1
        FROM j GROUP BY t
    ), risk AS (
        SELECT t, d, d1,
               sum(n_in) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS n,
               sum(n1_in) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS n1
        FROM buck
    ), ev AS (SELECT t, d, d1, n, n1 FROM risk WHERE d > 0 AND n > 1),
    folded AS (
        SELECT CAST(sum(d1) AS BIGINT) AS o1,
               list_reduce([s.e FOR s IN list(struct_pack(i := t,
                   e := d * n1 * 1.0 / n) ORDER BY t)],
                   (a, b) -> a + b) AS e1,
               list_reduce([s.v FOR s IN list(struct_pack(i := t,
                   v := d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
                        * (n - d) / (n - 1)) ORDER BY t)],
                   (a, b) -> a + b) AS vs
        FROM ev
    ), sizes AS (
        SELECT CAST(sum(g1) AS BIGINT) AS n_grp1,
               CAST(count(*) AS BIGINT) AS n_total
        FROM j
    )
    SELECT n_grp1, n_total, o1, round(e1, 6) AS e1,
           CASE WHEN vs <> 0
                THEN round((o1 - e1) * (o1 - e1) / vs, 4) END AS chi2,
           CASE WHEN vs <> 0
                THEN (o1 - e1) * (o1 - e1) / vs > 3.841459
           END AS significant
    FROM folded CROSS JOIN sizes
    """,
)
def logrank_survival_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test: do BUILDING-segment customers churn
    on a different survival curve than everyone else? The
    hypothesis-test companion to ``kaplan_meier_churn`` — KM draws a
    curve, the log-rank compares two. At each event time the group-1
    expected deaths under H0 are E = d*n1/n (hypergeometric mean) with
    variance V = d*(n1/n)*(1-n1/n)*(n-d)/(n-1); the statistic
    (O1 - sum E)^2 / sum V is chi-square(1).

    Float parity: every per-time ingredient (d, d1, n, n1) is an exact
    INTEGER in both engines, so each E/V term is the identical
    expression over bit-identical operands; the cross-time sums run as
    ORDERED array folds (sort_array + F.aggregate vs list(... ORDER BY
    t) + list_reduce — the jackknife discipline), so summation order
    cannot diverge; the n=1 risk tail is filtered by an integer
    predicate and a V=0 degenerate pins chi2/significant to NULL.

    Scale: one fact scan -> per-customer (min,max) partials, plus one
    column-pruned partial-max scan for the observation end (no shuffle;
    max of per-customer maxes = the plain column max); the segment join
    is broadcast (customer dim); everything after runs on the
    |half-year buckets| spine (~14 rows) — the folds are over a bounded
    calendar-sized array, never fact-sized, and the group sizes come
    from the same terminal aggregate (maxima of the cumulative risk
    sums), so no customer-sized frame is ever cached."""
    ensure_utc(spark)
    o = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    # r16 (VERDICT r15 items 1-2): the two |customers|-row caches
    # (lifetimes + classified frame) were corpus-proportional and their
    # materialization barriers cost more than the scans they saved.
    # Neither is needed: the observation end is max(o_orderdate)
    # directly (max of per-customer maxes = the column max — a pruned
    # partial-max scan, no shuffle), and the size aggregate folds into
    # the terminal aggregate below (totals = the max of the
    # descending-cumulative risk sums), leaving `j` a single consumer.
    # 2 pruned orders scans + 1 customer scan, 0 caches.
    cust = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    obs = o.agg(F.max("o_orderdate").alias("te"))
    j = (
        cust.join(F.broadcast(cu), cust.o_custkey == cu.c_custkey)
        .crossJoin(F.broadcast(obs))
        .select(
            F.floor(F.datediff("l", "f") / 180).cast("int").alias("t"),
            (F.datediff("te", "l") >= 365).cast("int").alias("churn"),
            (F.col("c_mktsegment") == "BUILDING").cast("int").alias("g1"),
        )
    )
    buck = j.groupBy("t").agg(
        F.count("*").alias("n_in"),
        F.sum("churn").alias("d"),
        F.sum("g1").alias("n1_in"),
        F.sum(F.col("churn") * F.col("g1")).alias("d1"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = buck.select(
        "t",
        "d",
        "d1",
        F.sum("n_in").over(w_desc).alias("n"),
        F.sum("n1_in").over(w_desc).alias("n1"),
    )
    # ONE terminal aggregate over the |buckets|-row risk spine computes
    # the event fold AND the group sizes (r16): the qualifying-row
    # filter moves inside when() guards (collect_list skips NULLs, so
    # the folded array is identical to the old filtered ev frame), and
    # the totals are the maxima of the descending-cumulative sums —
    # both n and n1 accumulate every bucket by the last (smallest-t)
    # row, so max(n) = |customers| and max(n1) = |group 1| exactly.
    qual = (F.col("d") > 0) & (F.col("n") > 1)
    e = F.col("d") * F.col("n1") * 1.0 / F.col("n")
    v = (
        F.col("d")
        * (F.col("n1") * 1.0 / F.col("n"))
        * (1 - F.col("n1") * 1.0 / F.col("n"))
        * (F.col("n") - F.col("d"))
        / (F.col("n") - 1)
    )
    # No-event degenerate: Spark's empty collect_list folds to 0.0 but
    # DuckDB's empty list() is NULL — pin e1/vs to NULL here too so the
    # engines agree on the degenerate row (the review finding).
    folded = risk.agg(
        F.sum(F.when(qual, F.col("d1"))).cast("bigint").alias("o1"),
        F.array_sort(
            F.collect_list(
                F.when(qual, F.struct(F.col("t"), e.alias("e"), v.alias("v")))
            )
        ).alias("a"),
        F.coalesce(F.max("n"), F.lit(0)).cast("bigint").alias("n_total"),
        F.max("n1").cast("bigint").alias("n_grp1"),
    ).select(
        "o1",
        F.when(
            F.size("a") > 0,
            ordered_fold_sum(F.transform("a", lambda x: x["e"])),
        ).alias("e1"),
        F.when(
            F.size("a") > 0,
            ordered_fold_sum(F.transform("a", lambda x: x["v"])),
        ).alias("vs"),
        "n_total",
        "n_grp1",
    )
    chi2 = (
        (F.col("o1") - F.col("e1"))
        * (F.col("o1") - F.col("e1"))
        / F.col("vs")
    )
    return folded.select(
        "n_grp1",
        "n_total",
        "o1",
        F.round("e1", 6).alias("e1"),
        F.when(F.col("vs") != 0, F.round(chi2, 4)).alias("chi2"),
        F.when(F.col("vs") != 0, chi2 > 3.841459).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function: lag-k serial correlation of daily revenue —
# the memory-structure member of the forecasting family (MASE scores a
# forecast, OLS/Theil-Sen fit the drift; the ACF says whether
# yesterday predicts today at all, and at which seasonal lags).
# ---------------------------------------------------------------------------


@query(
    "acf_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS yc
        FROM orders GROUP BY o_orderdate
    ), mind AS (SELECT min(day) AS d0 FROM daily),
    idx AS (
        SELECT CAST(datediff('day', (SELECT d0 FROM mind), day)
                    AS BIGINT) AS x, yc
        FROM daily
    ), st AS (SELECT sum(yc) * 1.0 / count(*) AS m FROM idx),
    den AS (
        SELECT list_reduce([s.t FOR s IN list(struct_pack(i := x,
                   t := (yc - (SELECT m FROM st))
                        * (yc - (SELECT m FROM st))) ORDER BY x)],
               (a, b) -> a + b) AS d
        FROM idx
    ), lagp AS (
        SELECT k.k, a.x,
               (a.yc - (SELECT m FROM st))
               * (b.yc - (SELECT m FROM st)) AS term
        FROM generate_series(1, 7) AS k(k)
        JOIN idx a ON true
        JOIN idx b ON b.x = a.x + k.k
    ), num AS (
        SELECT k, count(*) AS n_pairs,
               list_reduce([s.t FOR s IN list(struct_pack(i := x,
                   t := term) ORDER BY x)], (a, b) -> a + b) AS nm
        FROM lagp GROUP BY k
    )
    SELECT CAST(k AS INTEGER) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
           CASE WHEN d <> 0 THEN round(nm / d, 6) END AS acf
    FROM num CROSS JOIN den ORDER BY lag
    """,
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..7:
    acf_k = sum((y_t - m)(y_{t+k} - m)) / sum((y_t - m)^2) over the
    daily spine — the serial-memory monitor of the forecasting family
    (``seasonal_naive_mase`` assumes a weekly echo; the ACF at lag 7
    is the direct measurement of whether that echo exists).

    Float parity: daily revenues are exact CENTS (grid-sum rule); the
    global mean m = sum/n is ONE division of bit-identical int64
    operands; every centered product is the identical expression over
    (int64 - m) doubles; and both the numerator and denominator sums
    run as ORDERED array folds keyed by day index (sort_array +
    F.aggregate vs list(... ORDER BY x) + list_reduce), so no
    engine-specific summation order exists. A constant series makes
    the denominator exactly 0.0; both engines pin acf to NULL.

    Scale: one fact scan -> per-day partials; the spine (|days| rows,
    calendar-bounded) is broadcast into a 7-lag self-join; folds run
    over <= |days| element arrays (~20 KB) on the driver-free
    aggregation path. Nothing fact-sized crosses a second shuffle."""
    daily = _daily_cents(spark, sf_dir)  # cached in the helper (r15)
    mind = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mind)).select(
        F.datediff("day", "d0").cast("bigint").alias("x"), "yc"
    )
    st = idx.agg(
        (F.sum("yc") * 1.0 / F.count("*")).alias("m")
    )
    # cache the |days|-row centered spine (r15): `ctr` feeds the
    # denominator fold AND both sides of the 7-lag join, and its
    # lineage nests the d0/mean broadcasts — uncached, the three
    # consumers re-evaluated the whole chain and the fact groupBy ran
    # TWELVE times per query (plan audit; 1 scan after). Values are
    # unchanged, so the hash is too.
    ctr = idx.crossJoin(F.broadcast(st)).coalesce(1).cache()
    den = (
        ctr.select(
            "x",
            ((F.col("yc") - F.col("m")) * (F.col("yc") - F.col("m"))).alias(
                "t"
            ),
        )
        .agg(F.array_sort(F.collect_list(F.struct("x", "t"))).alias("a"))
        .select(ordered_fold_sum(F.transform("a", lambda s: s["t"])).alias("d"))
    )
    ks = spark.range(1, 8).select(F.col("id").cast("bigint").alias("k"))
    a = ctr.alias("a")
    b = ctr.alias("b")
    lagp = (
        ks.crossJoin(a)
        .join(F.broadcast(b), F.col("b.x") == F.col("a.x") + F.col("k"))
        .select(
            "k",
            F.col("a.x").alias("x"),
            (
                (F.col("a.yc") - F.col("a.m"))
                * (F.col("b.yc") - F.col("b.m"))
            ).alias("term"),
        )
    )
    num = (
        lagp.groupBy("k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.array_sort(F.collect_list(F.struct("x", "term"))).alias("a"),
        )
        .select(
            "k",
            "n_pairs",
            ordered_fold_sum(F.transform("a", lambda s: s["term"])).alias("nm"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("k").cast("int").alias("lag"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.when(F.col("d") != 0, F.round(F.col("nm") / F.col("d"), 6)).alias(
            "acf"
        ),
    )


# ---------------------------------------------------------------------------
# Pinball loss: quantile-forecast evaluation — the quantile member of
# the forecast-eval family (MASE scores the point forecast; pinball
# scores quantile forecasts, and is INTEGER-exact here because the
# tenth-quantile losses scale to integers).
# ---------------------------------------------------------------------------


@query(
    "pinball_quantile_eval",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS yc
        FROM orders GROUP BY o_orderdate
    ), mind AS (SELECT min(day) AS d0 FROM daily),
    idx AS (
        SELECT CAST(datediff('day', (SELECT d0 FROM mind), day)
                    AS BIGINT) AS x, yc
        FROM daily
    ), fc AS (
        SELECT a.yc - b.yc AS diff
        FROM idx a JOIN idx b ON b.x = a.x - 7
    ), q AS (SELECT unnest([1, 5, 9]) AS t)
    SELECT CAST(t AS INTEGER) AS q_tenths,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(greatest(t * diff, (t - 10) * diff)) AS BIGINT)
               AS sum_pinball_x10,
           round(sum(greatest(t * diff, (t - 10) * diff))
                 / (10.0 * count(*)) / 100, 6) AS mean_pinball
    FROM q CROSS JOIN fc GROUP BY t ORDER BY t
    """,
)
def pinball_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecast — the
    quantile member of the forecast-eval family: MASE
    (``seasonal_naive_mase``) scores the point forecast; a pipeline
    shipping P10/P50/P90 revenue bands is scored by pinball loss
    L_q(y, f) = max(q(y-f), (q-1)(y-f)), here with the same-weekday
    lag-7 naive as the forecaster under test at q in {0.1, 0.5, 0.9}.

    Float parity: INTEGER-exact by construction — daily revenues are
    exact cents (grid-sum rule), the forecast error diff is int64, and
    for tenth quantiles 10*L_q = max(t*diff, (t-10)*diff) with t =
    10q is pure integer arithmetic, so the summed loss is an exact
    int64 in both engines (no ordered folds needed); the mean is the
    identical division shape over bit-identical operands, rounded 6dp.

    Scale: one fact scan -> per-day partials; the lag join and the
    3-quantile fan-out run on the calendar-bounded spine."""
    daily = _daily_cents(spark, sf_dir)
    mind = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mind)).select(
        F.datediff("day", "d0").cast("bigint").alias("x"), "yc"
    )
    a = idx.alias("a")
    b = idx.alias("b")
    fc = a.join(
        F.broadcast(b), F.col("b.x") == F.col("a.x") - 7
    ).select((F.col("a.yc") - F.col("b.yc")).alias("diff"))
    q = spark.createDataFrame([(1,), (5,), (9,)], "t BIGINT")
    loss10 = F.greatest(
        F.col("t") * F.col("diff"), (F.col("t") - 10) * F.col("diff")
    )
    return (
        F.broadcast(q)
        .crossJoin(fc)
        .groupBy("t")
        .agg(
            F.count("*").alias("n"),
            F.sum(loss10).alias("s10"),
        )
        .select(
            F.col("t").cast("int").alias("q_tenths"),
            F.col("n").cast("bigint").alias("n_days"),
            F.col("s10").cast("bigint").alias("sum_pinball_x10"),
            F.round(
                F.col("s10") / (10.0 * F.col("n")) / 100, 6
            ).alias("mean_pinball"),
        )
    )


# ---------------------------------------------------------------------------
# Kendall tau-b: concordance trend test on the daily spine — completes
# the correlation family (Spearman ranks the fact table; Kendall counts
# concordant pairs on the calendar-bounded spine, the Mann-Kendall
# trend test every monitoring stack runs on daily series).
# ---------------------------------------------------------------------------


@query(
    "kendall_tau_trend",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS yc
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT CAST(EXTRACT(year FROM day) AS BIGINT) AS year,
               CAST(datediff('day', DATE '1990-01-01', day) AS BIGINT) AS x,
               yc
        FROM daily
    ), pr AS (
        SELECT a.year,
               CASE WHEN b.yc > a.yc THEN 1 ELSE 0 END AS c,
               CASE WHEN b.yc < a.yc THEN 1 ELSE 0 END AS d,
               CASE WHEN b.yc = a.yc THEN 1 ELSE 0 END AS t
        FROM idx a JOIN idx b ON b.year = a.year AND b.x > a.x
    ), m AS (
        SELECT year, sum(c) AS nc, sum(d) AS nd, sum(t) AS nty,
               count(*) AS n0
        FROM pr GROUP BY year
    )
    SELECT year, CAST(n0 AS BIGINT) AS n_pairs,
           CAST(nc AS BIGINT) AS n_concordant,
           CAST(nd AS BIGINT) AS n_discordant,
           CAST(nty AS BIGINT) AS n_ties,
           CASE WHEN n0 > nty THEN
               round((nc - nd) * 1.0
                     / sqrt(CAST(n0 AS DOUBLE) * (n0 - nty)), 6)
           END AS tau_b
    FROM m ORDER BY year
    """,
)
def kendall_tau_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b of daily revenue against time, per year — the
    Mann-Kendall monotone-trend test: count concordant vs discordant
    day pairs (x is the day index, so every pair is x-ordered and
    tau > 0 means revenue tends upward). Completes the correlation
    family: Spearman (``spearman_rank_corr``) ranks fact-scale
    columns; Kendall's pair-counting form runs on the calendar-bounded
    spine where its O(m^2) is a constant (<= 66,795 pairs/year).

    Float parity: concordant/discordant/tie counts are exact INTEGERS
    (comparisons of exact cents); n0 = m(m-1)/2 <= 66,795, so the
    variance product n0*(n0 - nty) <= 4.5e9 sits far inside exact
    int64; tau_b is one sqrt + one division over bit-identical
    operands (x-ties are structurally zero — days are distinct — so
    the tau-b denominator keeps only the y-tie term), NULL-pinned if
    every pair ties. Degenerate years with a single day produce no
    pairs and drop out of the join in both engines.

    Scale: identical posture to ``theilsen_revenue_trend`` — the only
    fact-sized pass is the per-day partial aggregation; pairs are
    generated on the per-year spine whose size is calendar-bounded,
    independent of fact rows."""
    daily = _daily_cents(spark, sf_dir)
    idx = daily.select(
        F.year("day").cast("bigint").alias("year"),
        F.datediff("day", F.lit("1990-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        "yc",
    )
    a = idx.alias("a")
    b = idx.alias("b")
    pr = a.join(
        b,
        (F.col("b.year") == F.col("a.year")) & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.year").alias("year"),
        (F.col("b.yc") > F.col("a.yc")).cast("bigint").alias("c"),
        (F.col("b.yc") < F.col("a.yc")).cast("bigint").alias("d"),
        (F.col("b.yc") == F.col("a.yc")).cast("bigint").alias("t"),
    )
    m = pr.groupBy("year").agg(
        F.sum("c").alias("nc"),
        F.sum("d").alias("nd"),
        F.sum("t").alias("nty"),
        F.count("*").alias("n0"),
    )
    return m.select(
        "year",
        F.col("n0").cast("bigint").alias("n_pairs"),
        F.col("nc").cast("bigint").alias("n_concordant"),
        F.col("nd").cast("bigint").alias("n_discordant"),
        F.col("nty").cast("bigint").alias("n_ties"),
        F.when(
            F.col("n0") > F.col("nty"),
            F.round(
                (F.col("nc") - F.col("nd"))
                * 1.0
                / F.sqrt(
                    F.col("n0").cast("double")
                    * (F.col("n0") - F.col("nty"))
                ),
                6,
            ),
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test: is the daily series random around its
# median, or does it trend/oscillate — the randomness member of the
# diagnostics family (ACF measures memory strength per lag; the runs
# test is the distribution-free yes/no on serial dependence).
# ---------------------------------------------------------------------------


@query(
    "runs_test_randomness",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS yc
        FROM orders GROUP BY o_orderdate
    ), arr AS (
        SELECT list(yc ORDER BY yc) AS ls, count(*) AS m FROM daily
    ), med AS (
        SELECT (ls[CAST((m + 1) // 2 AS INTEGER)]
                + ls[CAST(m // 2 + 1 AS INTEGER)]) / 2.0 AS md
        FROM arr
    ), signs AS (
        SELECT day, yc > (SELECT md FROM med) AS up
        FROM daily WHERE yc <> (SELECT md FROM med)
    ), flips AS (
        SELECT up, CASE WHEN up <> lag(up) OVER (ORDER BY day)
                        THEN 1 ELSE 0 END AS flip
        FROM signs
    ), m AS (
        SELECT count(*) FILTER (WHERE up) AS n1,
               count(*) FILTER (WHERE NOT up) AS n2,
               CASE WHEN count(*) = 0 THEN 0
                    ELSE 1 + sum(flip) END AS runs,
               count(*) AS n
        FROM flips
    )
    SELECT CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
           CAST(runs AS BIGINT) AS n_runs,
           CASE WHEN n > 0 THEN round(2.0 * n1 * n2 / n + 1, 6)
           END AS expected_runs,
           CASE WHEN n1 > 0 AND n2 > 0 AND 2.0 * n1 * n2 <> n THEN
               round((runs - (2.0 * n1 * n2 / n + 1))
                     / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                            / (1.0 * n * n * (n - 1))), 4)
           END AS z
    FROM m
    """,
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue around its median —
    the distribution-free serial-dependence diagnostic (a trending
    series produces too FEW runs, an oscillating one too MANY; the ACF
    says how much memory, this says whether the deviation from
    randomness is significant at all). Days equal to the median are
    dropped (the standard treatment); runs counted by sign flips over
    the day-ordered spine; z from the exact run-count moments
    mu = 2*n1*n2/n + 1, var = 2*n1*n2*(2*n1*n2 - n)/(n^2*(n-1)).

    Float parity: the median is an EXPLICIT sorted-array selection
    over exact cents (the theilsen discipline); above/below/run
    counts are exact integers (comparisons against the same
    half-grid median double); mu/var/z are identical expression
    shapes over bit-identical integer operands — one sqrt, one
    terminal round; the degenerate all-one-side and var=0 cases pin
    z to NULL in both engines, and the constant-series case (every
    day equals the median, signs empty) pins counts/runs to 0 and
    expected_runs/z to NULL symmetrically (ADVICE r11).

    Scale: one fact scan -> per-day partials; the sort, the lag
    window, and the moments all run on the calendar-bounded spine."""
    daily = _daily_cents(spark, sf_dir)
    arr = daily.agg(
        F.sort_array(F.collect_list("yc")).alias("ls"),
        F.count("*").alias("m"),
    )
    med = arr.select(
        (
            (
                F.element_at("ls", ((F.col("m") + 1) / 2).cast("int"))
                + F.element_at("ls", (F.col("m") / 2 + 1).cast("int"))
            )
            / 2.0
        ).alias("md")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("yc") != F.col("md"))
        .select("day", (F.col("yc") > F.col("md")).alias("up"))
    )
    w = Window.orderBy("day")
    flips = signs.select(
        "up",
        F.when(F.col("up") != F.lag("up").over(w), 1)
        .otherwise(0)
        .alias("flip"),
    )
    # Degenerate guard (ADVICE r11): if every day equals the median,
    # `signs` is empty — Spark's sum over the empty frame yields NULL
    # where DuckDB's count(*) FILTER yields 0. Coalesce the counts to
    # 0, pin runs to 0, and gate expected_runs on n > 0 so the
    # constant-series case is NULL-pinned symmetrically in both
    # engines (the logrank/acf discipline).
    m = flips.agg(
        F.coalesce(F.sum(F.col("up").cast("bigint")), F.lit(0)).alias("n1"),
        F.coalesce(F.sum((~F.col("up")).cast("bigint")), F.lit(0)).alias(
            "n2"
        ),
        F.when(F.count("*") == 0, F.lit(0))
        .otherwise(1 + F.sum("flip"))
        .alias("runs"),
        F.count("*").alias("n"),
    )
    mu = 2.0 * F.col("n1") * F.col("n2") / F.col("n") + 1
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n"))
        / (1.0 * F.col("n") * F.col("n") * (F.col("n") - 1))
    )
    return m.select(
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        F.col("runs").cast("bigint").alias("n_runs"),
        F.when(F.col("n") > 0, F.round(mu, 6)).alias("expected_runs"),
        F.when(
            (F.col("n1") > 0)
            & (F.col("n2") > 0)
            & (2.0 * F.col("n1") * F.col("n2") != F.col("n")),
            F.round((F.col("runs") - mu) / F.sqrt(var), 4),
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Poisson dispersion check: variance-to-mean of daily event counts —
# the rate-monitoring diagnostic (a Poisson arrival process has D = 1;
# D >> 1 means bursty/clumped traffic, D << 1 means throttled).
# ---------------------------------------------------------------------------


@query(
    "poisson_dispersion_check",
    oracle="""
    WITH span AS (
        SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        FROM events
    ), days AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM span
    ), types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT day, event_type FROM days CROSS JOIN types),
    cnt AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ), filled AS (
        SELECT g.event_type, coalesce(c.c, 0) AS c
        FROM grid g LEFT JOIN cnt c
          ON c.day = g.day AND c.event_type = g.event_type
    ), m AS (
        SELECT event_type, count(*) AS n, sum(c) AS s,
               sum(c * c) AS ss
        FROM filled GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS n_events,
           round(s * 1.0 / n, 4) AS mean_daily,
           CASE WHEN s > 0 AND n > 1 THEN
               round((n * ss - s * s) * 1.0 / ((n - 1) * s), 6)
           END AS dispersion,
           CASE WHEN s > 0 AND n > 1 THEN
               (n * ss - s * s) * 1.0 / ((n - 1) * s) > 1.0
           END AS overdispersed
    FROM m ORDER BY event_type
    """,
)
def poisson_dispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion index of daily event counts per type —
    D = sample variance / mean; a memoryless arrival process pins
    D = 1, so D >> 1 flags bursty ingestion (retry storms, batch
    replays) and D << 1 flags throttling — the standard first check
    on an event-rate monitor before alert thresholds are trusted.
    Zero-event days COUNT (the gap-filled daily x type grid — a
    missing day is the strongest burstiness signal there is).

    Float parity: daily counts are exact integers on a gap-filled
    calendar grid; D = (n*Sum(c^2) - S^2) / ((n-1)*S) is ONE division
    of bit-identical int64 operands (bounds: c <= events/day, the
    moments stay far inside int64 at any driver sf), as is the mean;
    the overdispersed flag compares the UNROUNDED double in both
    engines; S = 0 / n = 1 degenerates pin D to NULL.

    Scale: one fact scan -> per-(day, type) partials, plus one
    column-pruned partial-min/max scan for the span (no shuffle); the
    zero-filled grid never materializes — zero days contribute nothing
    to the sums and the day count is span arithmetic — so the moments
    are a |types|-row aggregate over observed counts only."""
    ensure_utc(spark)
    e = table(spark, sf_dir, "events")
    # r16: the gap-filled day x type grid is algebraically unnecessary —
    # a zero-count day contributes 0 to s and 0 to ss, and n is the SAME
    # |span days| for every type, so the moments come straight from the
    # observed per-(day, type) counts plus one 1-row span broadcast:
    # n = datediff(d1, d0) + 1, s/ss = sums over observed rows. This
    # removes the r15 cache (whose fill barrier cost more than the scan
    # it saved — VERDICT r15 item 3), the calendar explode, and the
    # grid left join: one fact groupBy + one pruned partial-min/max
    # scan, no cache, no join.
    cnt = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    span = e.agg(
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            + 1
        )
        .cast("bigint")
        .alias("n")
    )
    m = (
        cnt.groupBy("event_type")
        .agg(
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
        )
        .crossJoin(F.broadcast(span))
    )
    disp = (
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        * 1.0
        / ((F.col("n") - 1) * F.col("s"))
    )
    ok = (F.col("s") > 0) & (F.col("n") > 1)
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s").cast("bigint").alias("n_events"),
        F.round(F.col("s") * 1.0 / F.col("n"), 4).alias("mean_daily"),
        F.when(ok, F.round(disp, 6)).alias("dispersion"),
        F.when(ok, disp > 1.0).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Weekday seasonality strength: one-way variance decomposition of the
# daily series by weekday — the decomposition member of the forecasting
# family (ACF detects the weekly echo, MASE scores a forecast built on
# it; this quantifies HOW MUCH of daily variance the weekly cycle
# explains, the go/no-go number for a seasonal model).
# ---------------------------------------------------------------------------


@query(
    "weekday_seasonality_strength",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS yc
        FROM orders GROUP BY o_orderdate
    ), wd AS (
        SELECT dayofweek(day) + 1 AS w, yc FROM daily
    ), per AS (
        SELECT w, count(*) AS n, CAST(sum(yc) AS DOUBLE) AS s,
               CAST(sum(CAST(yc * yc AS HUGEINT)) AS DOUBLE) AS ss
        FROM wd GROUP BY w
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_all,
               list_reduce([x.v FOR x IN list(struct_pack(i := w,
                   v := s) ORDER BY w)], (a, b) -> a + b) AS s_all,
               list_reduce([x.v FOR x IN list(struct_pack(i := w,
                   v := ss) ORDER BY w)], (a, b) -> a + b) AS ss_all,
               list_reduce([x.v FOR x IN list(struct_pack(i := w,
                   v := ss - s * s / n) ORDER BY w)], (a, b) -> a + b)
                   AS ss_within
        FROM per
    )
    SELECT CAST(p.w AS INTEGER) AS weekday, CAST(p.n AS BIGINT) AS n_days,
           round(p.s / p.n / 100, 2) AS mean_daily_rev,
           CASE WHEN t.ss_all - t.s_all * t.s_all / t.n_all <> 0 THEN
               round(1 - t.ss_within
                     / (t.ss_all - t.s_all * t.s_all / t.n_all), 6)
           END AS seasonal_strength
    FROM per p CROSS JOIN tot t ORDER BY p.w
    """,
)
def weekday_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way variance decomposition of daily revenue by weekday:
    seasonal_strength = 1 - SS_within / SS_total, where SS_within sums
    each weekday's centered sum of squares — the fraction of daily
    variance the weekly cycle explains (the eta-squared of the weekday
    factor). ~0 here is the honest verdict on this synthetic corpus
    (no planted weekly cycle), exactly what the monitor should report
    before anyone ships a weekly-seasonal forecast; per-weekday means
    are the decomposition itself.

    Float parity: daily cents are exact int64; y^2 sums accumulate as
    DECIMAL(38,0) in Spark / HUGEINT in DuckDB (int64 would overflow
    past daily values of ~2e9 cents at large sf — the spearman
    discipline) and every moment converts to double from the SAME
    exact integer; the cross-weekday combinations are weekday-ORDERED
    folds (ordered_fold_sum / list_reduce), the within-group term
    ss - s*s/n is the identical expression shape per weekday, and the
    constant-series degenerate (SS_total = 0) pins strength to NULL in
    both engines.

    Scale: one fact scan -> per-day partials -> a 7-row per-weekday
    aggregate; the folds and the final join run on the 7-row spine."""
    daily = _daily_cents(spark, sf_dir)
    wd = daily.select(
        F.dayofweek("day").alias("w"),
        "yc",
    )
    per = wd.groupBy("w").agg(
        F.count("*").alias("n"),
        F.sum("yc").cast("double").alias("s"),
        F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)"))
        .cast("double")
        .alias("ss"),
    )
    arr = per.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.array_sort(
            F.collect_list(F.struct("w", "s", "ss", "n"))
        ).alias("a"),
    )
    tot = arr.select(
        "n_all",
        ordered_fold_sum(F.transform("a", lambda x: x["s"])).alias("s_all"),
        ordered_fold_sum(F.transform("a", lambda x: x["ss"])).alias(
            "ss_all"
        ),
        ordered_fold_sum(
            F.transform(
                "a", lambda x: x["ss"] - x["s"] * x["s"] / x["n"]
            )
        ).alias("ss_within"),
    )
    ss_total = F.col("ss_all") - F.col("s_all") * F.col("s_all") / F.col(
        "n_all"
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("w").cast("int").alias("weekday"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.col("s") / F.col("n") / 100, 2).alias("mean_daily_rev"),
        F.when(
            ss_total != 0,
            F.round(1 - F.col("ss_within") / ss_total, 6),
        ).alias("seasonal_strength"),
    )
