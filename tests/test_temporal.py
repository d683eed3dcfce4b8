"""Event-time analytics operators (pipeline/temporal.py) vs pure-Python
replays on a small deterministic event log, plus hand-built edge cases
(gap boundaries, timestamp ties, funnel strict ordering)."""

import datetime as dt
import random
from collections import defaultdict

from pyspark.sql import functions as F

from graph_python_spark.pipeline.temporal import (
    asof_last_event,
    cohort_retention,
    funnel_counts_df,
    sessionize,
)

EPOCH0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    """rows: (event_id, seconds_offset, user_id, event_type, value)."""
    data = [
        (int(e), EPOCH0 + dt.timedelta(seconds=float(s)), int(u), t, float(v))
        for e, s, u, t, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def rand_events(n=400, users=12, span=20000, seed=11):
    rng = random.Random(seed)
    types = ["view", "click", "purchase", "error"]
    return [
        (i, rng.uniform(0, span), rng.randrange(users), rng.choice(types),
         round(rng.uniform(0, 10), 3))
        for i in range(n)
    ]


def base_epoch():
    return EPOCH0.replace(tzinfo=dt.timezone.utc).timestamp()


def test_sessionize_gap_boundary(spark):
    # user 1: gaps of exactly 1800 (same session) and 1800.000001 (new)
    rows = [
        (1, 0, 1, "view", 1.0),
        (2, 1800, 1, "view", 2.0),        # delta == gap -> same session
        (3, 3600.000001, 1, "view", 3.0),  # delta > gap -> new session
        (4, 100, 2, "click", 5.0),
    ]
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(_ev(spark, rows), gap_seconds=1800.0).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 1)]["duration_sec"] == 1800.0
    assert out[(1, 1)]["total_value"] == 3.0
    assert out[(1, 2)]["n_events"] == 1
    e0 = base_epoch()
    assert out[(1, 1)]["session_start_epoch"] == int(e0)
    assert out[(2, 1)]["session_start_epoch"] == int(e0 + 100)


def test_sessionize_differential(spark):
    rows = rand_events()
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], round(r["total_value"], 6))
        for r in sessionize(_ev(spark, rows), gap_seconds=900.0).collect()
    }
    per_user = defaultdict(list)
    for e, s, u, t, v in rows:
        per_user[u].append((s, e, v))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        seq, prev = 0, None
        bucket = defaultdict(lambda: [0, 0.0])
        for s, e, v in evs:
            if prev is None or s - prev > 900.0:
                seq += 1
            bucket[seq][0] += 1
            bucket[seq][1] += v
            prev = s
        for seq, (n, tv) in bucket.items():
            want[(u, seq)] = (n, round(tv, 6))
    assert got == want


def test_asof_strict_and_ties(spark):
    rows = [
        (1, 100, 1, "click", 0.0),
        (2, 100, 1, "purchase", 0.0),   # tie with click 1 -> excluded (strict)
        (3, 200, 1, "purchase", 0.0),   # matches click 1
        (4, 150, 1, "click", 0.0),      # later click before purchase 3
        (5, 50, 2, "purchase", 0.0),    # user 2 has no click -> dropped
    ]
    got = {r["event_id"]: r for r in asof_last_event(
        _ev(spark, rows), right_type="purchase", left_type="click").collect()}
    assert set(got) == {3}
    assert got[3]["prev_event_id"] == 4
    assert got[3]["lag_sec"] == 50.0


def test_asof_differential(spark):
    rows = rand_events(seed=13)
    got = {r["event_id"]: r["prev_event_id"] for r in asof_last_event(
        _ev(spark, rows), right_type="purchase", left_type="click").collect()}
    per_user = defaultdict(list)
    for e, s, u, t, v in rows:
        if t in ("click", "purchase"):
            per_user[u].append((s, e, t))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        last_click = None
        for s, e, t in evs:
            if t == "purchase" and last_click is not None and last_click[0] < s:
                want[e] = last_click[1]
            if t == "click":
                last_click = (s, e)
    assert got == want


def test_funnel_strict_order(spark):
    rows = [
        # user 1 completes view < click < purchase
        (1, 10, 1, "view", 0.0), (2, 20, 1, "click", 0.0), (3, 30, 1, "purchase", 0.0),
        # user 2 clicks BEFORE first view -> stops at step 1
        (4, 20, 2, "click", 0.0), (5, 30, 2, "view", 0.0),
        # user 3 view+click, purchase tied with click -> strict > excludes
        (6, 10, 3, "view", 0.0), (7, 20, 3, "click", 0.0), (8, 20, 3, "purchase", 0.0),
    ]
    got = {r["step_name"]: r["n_users"] for r in funnel_counts_df(
        _ev(spark, rows), steps=["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention(spark):
    week = 604800
    rows = [
        (1, 0, 1, "view", 0.0), (2, week + 5, 1, "view", 0.0),   # offsets 0, 1
        (3, week + 1, 2, "view", 0.0),                            # cohort wk1, offset 0
        (4, 3 * week, 1, "view", 0.0),                            # offset 3
    ]
    got = {(r["cohort_bucket"], r["bucket_offset"]): r["n_users"]
           for r in cohort_retention(_ev(spark, rows), bucket_seconds=week).collect()}
    w0 = int(base_epoch() // week)
    assert got == {(w0, 0): 1, (w0, 1): 1, (w0, 3): 1, (w0 + 1, 0): 1}


def test_plans_are_partition_parallel(spark):
    """No single-partition global window and no nested-loop join in any
    temporal plan — every Exchange hashes on the user key."""
    ev = _ev(spark, rand_events(n=50))
    for df in (
        sessionize(ev),
        asof_last_event(ev, right_type="purchase", left_type="click"),
        funnel_counts_df(ev, steps=["view", "click", "purchase"]),
        cohort_retention(ev),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Closed sessions emitted by the streaming sessionizer equal the batch
    sessionize rows once the watermark passes every user's gap horizon."""
    from graph_python_spark.streaming.streams import run_to_memory, stream_sessionize

    rows = []
    eid = 0
    for u in range(3):
        for sess in range(3):
            base = u * 17 + sess * 5000  # sessions 5000s apart, gap 600s
            for k in range(4):
                rows.append((eid, base + k * 100, u, "click", float(u + k)))
                eid += 1
    ev = _ev(spark, rows)
    path = str(tmp_path / "sess_events")
    # file 1: the data; files 2+3: far-future sentinels that advance the
    # watermark so every real session times out and is emitted
    ev.withColumn("props", F.lit("{}")) \
        .select("event_id", "ts", "user_id", "event_type", "value", "props") \
        .coalesce(1).write.parquet(path)
    sentinel = _ev(spark, [(99990, 2 * 86400, 99, "click", 0.0)])
    sentinel2 = _ev(spark, [(99991, 4 * 86400, 99, "click", 0.0)])
    for s in (sentinel, sentinel2):
        s.withColumn("props", F.lit("{}")) \
            .select("event_id", "ts", "user_id", "event_type", "value", "props") \
            .coalesce(1).write.mode("append").parquet(path)

    out = stream_sessionize(spark, path, gap_seconds=600.0,
                            watermark="10 minutes", max_files_per_trigger=1)
    run_to_memory(out, "ssess", "append")
    got = {(r["user_id"], r["session_seq"]):
           (r["session_start_epoch"], r["n_events"], r["duration_sec"], r["total_value"])
           for r in spark.sql("SELECT * FROM ssess WHERE user_id < 99").collect()}

    want = {(r["user_id"], r["session_seq"]):
            (r["session_start_epoch"], r["n_events"], r["duration_sec"], r["total_value"])
            for r in sessionize(ev, gap_seconds=600.0).collect()}
    assert got == want
    assert len(got) == 9
