"""Event-time analytics operators: sessionization, as-of join, funnel,
cohort retention.

The reference has no table/time layer (SURVEY.md §1: sparse algebra only),
but a link-graph engine fed by an event/corpus firehose needs these four
shapes constantly.  All four are single-key-shuffle plans:

- every window is ``partitionBy(user)`` — never a global window, so the
  plan is embarrassingly parallel across users and survives a 100x
  scale-up as long as no single user exceeds one partition's memory
  (events per user is bounded in practice; a pathological user can be
  salted by day before the window if needed);
- the as-of join is the union-window formulation (tag both relations,
  one sort per user partition) instead of a time-range join, which Spark
  would execute as BroadcastNestedLoop — O(n log n) per user vs O(n*m);
- funnel/cohort pre-aggregate to one row per user (or user-day) before
  any join, so joined relations are dimension-sized.

Timestamps are compared as epoch-seconds DOUBLE
(``ts.cast("timestamp").cast("double")`` — the parquet column is
TIMESTAMP_NTZ and the session timezone is pinned to UTC, so the NTZ→LTZ
step is identity; microsecond fraction preserved) — DuckDB's
``epoch(ts)`` produces the
identical double, which keeps gap/tie arithmetic bit-equal across engines
for the oracle harness.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Assign gap-based sessions per user and aggregate one row per session.

    A new session starts when the time since the user's previous event
    exceeds ``gap_seconds``.  Ties within a user are broken by ``id_col``
    so the session assignment is total-order deterministic.

    Returns (user, session_seq, session_start_epoch, n_events,
    duration_sec, total_value?).  One shuffle on ``user_col``; the lag +
    running-sum windows share the same partitioning so Catalyst plans a
    single Exchange + one sort.
    """
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    order = Window.partitionBy("user").orderBy(F.col("ep"), F.col("eid"))
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ep = F.lag("ep").over(order)
    flagged = events.select(
        F.col(user_col).alias("user"),
        epoch.alias("ep"),
        F.col(id_col).alias("eid"),
        *([F.col(value_col).alias("val")] if value_col else []),
    ).withColumn(
        "new_session",
        F.when(
            prev_ep.isNull() | ((F.col("ep") - prev_ep) > F.lit(float(gap_seconds))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("session_seq", F.sum("new_session").over(running))
    aggs = [
        F.count("*").cast("long").alias("n_events"),
        F.round(F.max("ep") - F.min("ep"), 6).alias("duration_sec"),
        F.min("ep").alias("_start"),
    ]
    if value_col:
        aggs.append(F.round(F.sum("val"), 6).alias("total_value"))
    out = sess.groupBy(
        F.col("user").alias(user_col), F.col("session_seq").cast("long").alias("session_seq")
    ).agg(*aggs)
    return out.select(
        user_col,
        "session_seq",
        F.floor(F.col("_start")).cast("long").alias("session_start_epoch"),
        "n_events",
        "duration_sec",
        *(["total_value"] if value_col else []),
    )


def asof_last_event(
    events: DataFrame,
    right_type: str,
    left_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """For each ``right_type`` event, the most recent STRICTLY EARLIER
    ``left_type`` event by the same user (e.g. purchase -> last click).

    Union-window as-of join: tag both filtered relations, sort once per
    user by (epoch, tag, id) with left rows before right rows at equal
    timestamps excluded by the strict ``<`` (tag orders left first so a
    shared timestamp never matches), and carry the last non-null left id
    forward.  One shuffle on the user key; no time-range join, so the
    plan contains no BroadcastNestedLoop and scales as O(n log n) per
    user partition.

    Right rows with no earlier left event are dropped (inner as-of).
    Output: (event_id, user, right_epoch, left_event_id, lag_sec).
    """
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    base = events.select(
        F.col(user_col).alias("user"),
        epoch.alias("ep"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin([left_type, right_type]))
    # tag 0 = left (source of carried values), 1 = right (probe)
    tagged = base.select(
        "user",
        "ep",
        "eid",
        F.when(F.col("etype") == left_type, F.lit(0)).otherwise(F.lit(1)).alias("tag"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy(F.col("ep"), F.col("tag"), F.col("eid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.withColumn(
        "left_eid",
        F.last(F.when(F.col("tag") == 0, F.col("eid")), ignorenulls=True).over(w),
    ).withColumn(
        "left_ep",
        F.last(F.when(F.col("tag") == 0, F.col("ep")), ignorenulls=True).over(w),
    )
    return (
        carried.filter((F.col("tag") == 1) & F.col("left_eid").isNotNull()
                       & (F.col("left_ep") < F.col("ep")))
        .select(
            F.col("eid").alias(id_col),
            F.col("user").alias(user_col),
            F.col("left_eid").alias("prev_event_id"),
            F.round(F.col("ep") - F.col("left_ep"), 6).alias("lag_sec"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: users whose first step-k event happens AFTER
    their established step-(k-1) time, chained left to right.

    Each stage is ``filter -> groupBy(user) -> min`` (map-side partial
    agg, one narrow shuffle on the user key) followed by an equi-join on
    the already user-unique previous stage — the joined relations shrink
    monotonically, and the event scan is pruned to one event_type per
    stage by predicate pushdown.  Returns one row per step:
    (step, step_name, n_users).
    """
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    base = events.select(
        F.col(user_col).alias("user"), epoch.alias("ep"), F.col(type_col).alias("etype")
    )
    reached = (
        base.filter(F.col("etype") == steps[0]).groupBy("user").agg(F.min("ep").alias("t"))
    )
    counts = [reached.count()]
    for s in steps[1:]:
        nxt = (
            base.filter(F.col("etype") == s)
            .join(reached.select("user", F.col("t").alias("t_prev")), "user")
            .filter(F.col("ep") > F.col("t_prev"))
            .groupBy("user")
            .agg(F.min("ep").alias("t"))
        )
        counts.append(nxt.count())
        reached = nxt
    spark = events.sparkSession
    rows = [(i + 1, steps[i], int(counts[i])) for i in range(len(steps))]
    return spark.createDataFrame(rows, "step long, step_name string, n_users long")


def funnel_counts_df(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Single-plan variant of :func:`funnel_counts` (no driver actions):
    the chained per-step user sets are unioned and aggregated in one
    DataFrame, so the whole funnel is one lazy plan the driver can submit
    as a unit (and the oracle harness can hash).
    """
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    base = events.select(
        F.col(user_col).alias("user"), epoch.alias("ep"), F.col(type_col).alias("etype")
    )
    reached = (
        base.filter(F.col("etype") == steps[0]).groupBy("user").agg(F.min("ep").alias("t"))
    )
    levels = [
        reached.select(F.lit(1).alias("step"), F.lit(steps[0]).alias("step_name"), "user")
    ]
    for k, s in enumerate(steps[1:], start=2):
        reached = (
            base.filter(F.col("etype") == s)
            .join(reached.select("user", F.col("t").alias("t_prev")), "user")
            .filter(F.col("ep") > F.col("t_prev"))
            .groupBy("user")
            .agg(F.min("ep").alias("t"))
        )
        levels.append(
            reached.select(F.lit(k).alias("step"), F.lit(s).alias("step_name"), "user")
        )
    union = levels[0]
    for lv in levels[1:]:
        union = union.unionByName(lv)
    return (
        union.groupBy(F.col("step").cast("long").alias("step"), "step_name")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def cohort_retention(
    events: DataFrame,
    bucket_seconds: int = 604800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention matrix: cohort bucket = the bucket of the
    user's first event; one output row per (cohort_bucket, offset) with
    the count of distinct users active ``offset`` buckets later.

    Two key-shuffles total: user-level min (map-side combined) and the
    distinct (user, bucket) activity relation; the join between them is
    on the user key with the cohort side already user-unique.  Output is
    O(buckets^2) rows — tiny at any scale.
    """
    bucket = F.floor(F.col(ts_col).cast("timestamp").cast("double") / F.lit(float(bucket_seconds))).cast("long")
    acts = events.select(F.col(user_col).alias("user"), bucket.alias("b")).distinct()
    cohort = acts.groupBy("user").agg(F.min("b").alias("cohort_b"))
    return (
        acts.join(cohort, "user")
        .groupBy(
            F.col("cohort_b").alias("cohort_bucket"),
            (F.col("b") - F.col("cohort_b")).cast("long").alias("bucket_offset"),
        )
        .agg(F.countDistinct("user").cast("long").alias("n_users"))
    )


def click_attribution(
    events: DataFrame,
    horizon_seconds: int = 3600,
    left_type: str = "click",
    right_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Interval join: every (click, purchase) pair by the same user with
    the purchase STRICTLY after the click and within ``horizon_seconds``
    — the batch twin of ``streaming.stream_click_attribution`` (ad-click
    attribution), emitting identical rows.

    Plan: the time range rides on a USER-KEY EQUI-JOIN (one hash/SMJ
    exchange per side on the user id, the range as a residual filter) —
    never a pure time-range join, which Spark would plan as
    BroadcastNestedLoop.  Per-user output is bounded by clicks×purchases
    inside the horizon, the same bound as the streaming state store.

    Output: (user_id, purchase_id, click_id, click_ts, buy_ts, value).
    """
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_eid"),
        F.col("event_type").alias("_etype"),
        "value",
    )
    clicks = base.filter(F.col("_etype") == left_type).select(
        "user_id", F.col("_ts").alias("click_ts"), F.col("_eid").alias("click_id"))
    buys = base.filter(F.col("_etype") == right_type).select(
        "user_id", F.col("_ts").alias("buy_ts"),
        F.col("_eid").alias("purchase_id"), "value")
    joined = clicks.join(buys, "user_id").filter(
        (F.col("click_ts") < F.col("buy_ts"))
        & (F.col("buy_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS"))
    )
    return joined.select("user_id", "purchase_id", "click_id",
                         "click_ts", "buy_ts", "value")


def event_bursts(
    events: DataFrame,
    bucket_seconds: int = 3600,
    z: float = 3.0,
) -> DataFrame:
    """Volume-burst detection: bucket events per (event_type, time window)
    and flag buckets whose count exceeds mean + ``z``·stddev of that
    type's bucket counts — the anomaly primitive for crawl/firehose
    monitoring.

    The per-bucket counts and their sums Σc, Σc² are exact 64-bit
    integers; the variance (n·Σc² − (Σc)²)/n² is then evaluated in DOUBLE
    (each product singly-rounded IEEE, identical in any engine — and,
    unlike 64-bit products, it cannot wrap when a type's total count
    passes ~3e9 at firehose scale).  Returns flagged buckets
    (event_type, bucket_start_epoch, n_events, zscore).

    Plan: one groupBy (type, bucket) over the raw events with map-side
    combine, one tiny groupBy(type) for the moments (|types| rows,
    broadcast back).  No windows, no collect.
    """
    ep = F.col("ts").cast("timestamp").cast("double")
    bucket = (F.floor(ep / bucket_seconds) * bucket_seconds).cast("long")
    counts = (
        events.select(F.col("event_type"), bucket.alias("bucket_start_epoch"))
        .groupBy("event_type", "bucket_start_epoch")
        .agg(F.count("*").alias("n_events"))
    )
    mom = counts.groupBy("event_type").agg(
        F.count("*").alias("nb"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    nb_d = F.col("nb").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    mean = s1_d / nb_d
    var = (nb_d * s2_d - s1_d * s1_d) / (nb_d * nb_d)
    return (
        counts.join(F.broadcast(mom), "event_type")
        .withColumn("_mean", mean)
        .withColumn("_sd", F.sqrt(var))
        .filter(F.col("n_events").cast("double")
                > F.col("_mean") + F.lit(float(z)) * F.col("_sd"))
        .select(
            "event_type",
            "bucket_start_epoch",
            F.col("n_events").cast("long").alias("n_events"),
            F.round((F.col("n_events") - F.col("_mean")) / F.col("_sd"), 6)
            .alias("zscore"),
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over per-user event sequences:
    for each user's (ts, event_id)-ordered stream, count (event_type →
    next event_type) transitions corpus-wide and attach the row-normalized
    probability — the session-model / next-action primitive.

    Returns (from_type, to_type, n_transitions, prob), prob = count /
    Σ_to count (exact integers, one final division, 6dp).

    Plan: ONE user-partitioned window (lead) — parallel across users,
    never global — then a groupBy on the (from, to) pair key (≤ |types|²
    rows after map-side combine).
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").cast("timestamp").cast("double"), F.col("event_id"))
    pairs = (
        events.select("user_id", "ts", "event_id",
                      F.col("event_type").alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n_transitions").alias("_tot"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.round(F.col("n_transitions").cast("double")
                / F.col("_tot").cast("double"), 6).alias("prob"),
    )
