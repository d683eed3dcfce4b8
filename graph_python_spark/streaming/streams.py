"""Structured Streaming operators.

The reference has NO streaming surface (SURVEY.md §2.7) — its only
incremental notion is nonblocking mode + wait().  These operators extend the
engine for the training-data-pipeline setting: edge/event streams landing in
object storage, processed incrementally with watermarks.

Both helpers run equally against a bounded directory (tests drive them with
``processAllAvailable`` on a parquet dir) and an unbounded source at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

EDGE_SCHEMA = T.StructType([
    T.StructField("src", T.LongType()),
    T.StructField("dst", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def stream_windowed_events(spark: SparkSession, path: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event aggregation with late-data watermark."""
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("window.start").alias("w_start"), "event_type", "n", "total_value")
    )


DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])


def stream_dedup_exact(spark: SparkSession, path: str,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: emit each distinct text's FIRST arrival and
    drop later byte-identical copies — the streaming twin of
    ``pipeline.dedup.exact_duplicates``.

    ``dropDuplicatesWithinWatermark`` keys the dedup state on the md5 text
    hash (32 bytes/doc, not the document body) and expires state once an
    entry's event time falls behind the watermark: state stays O(distinct
    docs within the watermark horizon), which is what makes this run
    indefinitely at ingest scale.
    """
    docs = spark.readStream.schema(DOC_SCHEMA).parquet(path)
    return (
        docs.withColumn("text_hash", F.md5(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .select("doc_id", "ts", "text_hash")
    )


def stream_degree_counts(spark: SparkSession, path: str,
                         watermark: str = "1 hour") -> DataFrame:
    """Incremental out-degree over an arriving edge stream — the streaming
    twin of ``reduce_rowwise(plus)``; complete-mode aggregation keyed by
    src, so each micro-batch only shuffles its delta (map-side combined)."""
    edges = spark.readStream.schema(EDGE_SCHEMA).parquet(path)
    return edges.groupBy("src").agg(F.count("*").alias("out_degree"))


def stream_user_stats(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    incremental per-user running aggregates (event count, value sum, first/
    last event time) carried in GroupState across micro-batches.

    This is the extension point for operators Structured Streaming's
    built-in aggregations can't express (arbitrary per-key state machines);
    the state is a single fixed-width row per user, so at scale state size
    is O(users) and each micro-batch shuffles only its delta (grouped by
    user_id).  Output mode: update (one refreshed row per user per batch).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(path)

    out_schema = ("user_id long, n_events long, total_value double, "
                  "first_ts timestamp, last_ts timestamp")
    state_schema = "n long, total double, first_us long, last_us long"

    def update(key, pdfs, state: GroupState):
        n, total, first_us, last_us = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            # dropna first: NaT.astype('int64') silently becomes INT64_MIN
            # and .min() on an empty series raises
            ts = pdf["ts"].dropna()
            if len(ts) == 0:
                continue
            ts_us = ts.astype("int64") // 1000  # ns -> us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, total, first_us, last_us))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n], "total_value": [total],
            "first_ts": [pd.Timestamp(first_us, unit="us") if first_us is not None else pd.NaT],
            "last_ts": [pd.Timestamp(last_us, unit="us") if last_us is not None else pd.NaT],
        })

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> None:
    """Drive a bounded stream to completion into an in-memory table."""
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode).trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()


def minhash_sig_cols(k: int = 8, text_col: str = "text"):
    """Per-ROW MinHash signature columns: mh_i = min over the document's
    tokens of md5('<i>:' || tok).  Identical values to the batch
    ``pipeline.dedup.minhash_signatures`` (duplicate tokens cannot change a
    min), but built as a pure row expression (array_min over a transformed
    token array) instead of an explode + groupBy — which is what lets it
    run inside a streaming query with no aggregation state at all."""
    from graph_python_spark.pipeline.text import tokens_col

    def hasher(i: int):
        # single-parameter lambda: a 2-arg one would make F.transform pass
        # the ARRAY index as the second argument, clobbering the binding
        return lambda t: F.md5(F.concat(F.lit(f"{i}:"), t))

    return [
        F.array_min(F.transform(tokens_col(text_col), hasher(i))).alias(f"mh{i}")
        for i in range(k)
    ]


def stream_dedup_minhash(spark: SparkSession, path: str, k: int = 8,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming NEAR-dup dedup at MinHash-signature grain: emit the first
    arrival of each distinct k-permutation signature, drop later documents
    whose whole signature collides (token-set Jaccard ~= 1 shares all k
    min-hashes with high probability — whitespace/reorder/dup variants
    collapse; byte-identical dedup is ``stream_dedup_exact``).

    State is keyed on the 32-byte md5 of the signature and expires behind
    the watermark, so it stays O(distinct signatures within the horizon) —
    never the documents themselves — at any ingest rate.
    """
    docs = spark.readStream.schema(DOC_SCHEMA).parquet(path)
    return (
        docs.select("doc_id", "ts", *minhash_sig_cols(k))
        .withColumn("sig_key",
                    F.md5(F.concat(*[F.col(f"mh{i}") for i in range(k)])))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["sig_key"])
        .select("doc_id", "ts", "sig_key")
    )


def stream_click_attribution(spark: SparkSession, path: str,
                             horizon_seconds: int = 3600,
                             watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every click
    by the same user within the preceding ``horizon_seconds`` — the
    canonical watermarked two-stream join (ad-click attribution).

    Both sides carry an event-time watermark and the join condition pairs
    the user-key equality with a bounded time range, so Spark's state
    store retains each side only ``watermark + horizon`` deep: state is
    O(events in the horizon window), never O(stream).  The shuffle key is
    the user id on both sides — the same single key-exchange plan as the
    batch twin ``pipeline.temporal.click_attribution``, which tests assert
    emits identical rows.
    """
    clicks = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(path)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"))
        .withWatermark("click_ts", watermark)
    )
    buys = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(path)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("user_id"),
                F.col("ts").alias("buy_ts"),
                F.col("event_id").alias("purchase_id"),
                F.col("value"))
        .withWatermark("buy_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") < F.col("buy_ts"))
        & (F.col("buy_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS"))
    )
    return clicks.join(buys, cond, "inner").select(
        "user_id", "purchase_id", "click_id", "click_ts", "buy_ts", "value")


def stream_enrich_events(spark: SparkSession, path: str,
                         dim: DataFrame,
                         key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: decorate the event stream with a
    static dimension table (user → attributes) — the lookup-table pattern
    of every streaming feature pipeline.

    Spark plans a stream-static join with the static side read fresh per
    micro-batch and broadcast when small — no streaming state at all (only
    stream-stream joins buffer).  Left join keeps events with no dimension
    row (attrs NULL) so the stream never silently drops records.
    """
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    return events.join(dim, key, "left")


def stream_sessionize(spark: SparkSession, path: str,
                      gap_seconds: float = 1800.0,
                      watermark: str = "1 hour",
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming sessionization — the incremental twin of
    ``pipeline.temporal.sessionize`` (same gap rule, same aggregates).

    Per-user GroupState holds ONLY the open session (seq, start_us,
    last_us, n, total — one fixed-width row per user).  A session closes
    and is emitted when either (a) a later event for the user arrives more
    than ``gap_seconds`` after the session's last event, or (b) the event-
    time watermark passes last_event + gap (``GroupStateTimeout.
    EventTimeTimeout``), which is what bounds state for users that simply
    stop: state is O(active users within the gap horizon), never O(events).

    Events inside a micro-batch are processed in (ts, event_id) order;
    out-of-order arrivals WITHIN the watermark horizon that land after the
    user's open-session tail are folded into the open session (their ts
    counts toward n/total but cannot reopen a closed session) — the
    standard streaming relaxation; the batch operator is the exact oracle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(path)

    out_schema = ("user_id long, session_seq long, session_start_epoch long, "
                  "n_events long, duration_sec double, total_value double")
    state_schema = "seq long, start_us long, last_us long, n long, total double"
    gap_us = int(gap_seconds * 1_000_000)

    def _row(user, seq, start_us, last_us, n, total):
        return pd.DataFrame({
            "user_id": [user], "session_seq": [seq],
            "session_start_epoch": [start_us // 1_000_000],
            "n_events": [n],
            "duration_sec": [round((last_us - start_us) / 1e6, 6)],
            "total_value": [round(total, 6)],
        })

    def update(key, pdfs, state: GroupState):
        user = key[0]
        if state.hasTimedOut:
            seq, start_us, last_us, n, total = state.get
            state.remove()
            yield _row(user, seq, start_us, last_us, n, total)
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.dropna(subset=["ts"])
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"])
        ts_us = (batch["ts"].astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
        vals = batch["value"].fillna(0.0).to_numpy()
        if state.exists:
            seq, start_us, last_us, n, total = state.get
        else:
            seq, start_us, last_us, n, total = 0, None, None, 0, 0.0
        for ev_us, v in zip(ts_us, vals):
            ev_us = int(ev_us)
            if start_us is None:
                seq, start_us, last_us, n, total = seq + 1, ev_us, ev_us, 1, float(v)
            elif ev_us - last_us > gap_us:
                yield _row(user, seq, start_us, last_us, n, total)
                seq, start_us, last_us, n, total = seq + 1, ev_us, ev_us, 1, float(v)
            else:
                last_us = max(last_us, ev_us)
                n += 1
                total += float(v)
        state.update((seq, start_us, last_us, n, total))
        # fire once the watermark passes the open session's gap horizon
        state.setTimeoutTimestamp(last_us // 1000 + int(gap_seconds * 1000))

    return events.withWatermark("ts", watermark).groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def stream_bursts(spark: SparkSession, path: str,
                  baseline: DataFrame,
                  bucket_seconds: int = 3600,
                  watermark: str = "2 hours",
                  z: float = 3.0) -> DataFrame:
    """Streaming twin of ``pipeline.temporal.event_bursts``: windowed
    per-type counts on the live stream, flagged against a STATIC baseline
    of per-type (mean, sd) bucket moments computed from history (the
    stream-static enrichment pattern — the baseline broadcasts, the
    stream never re-aggregates history).

    ``baseline``: static DataFrame (event_type, mean_events, sd_events);
    rows with sd_events ≤ 0 (a degenerate constant history) are dropped —
    such a baseline can never flag, rather than emitting NULL z-scores.
    Emits flagged windows (event_type, w_start, n_events, zscore) in
    append mode once the watermark closes each window — state is
    O(types × open windows).
    """
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    secs = f"{int(bucket_seconds)} seconds"
    counts = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", secs), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("w_start"), "event_type",
                "n_events")
    )
    return (
        counts.join(F.broadcast(baseline.filter(F.col("sd_events") > 0)),
                    "event_type")
        .filter(F.col("n_events").cast("double")
                > F.col("mean_events") + F.lit(float(z)) * F.col("sd_events"))
        .select("event_type", "w_start",
                F.col("n_events").cast("long").alias("n_events"),
                F.round((F.col("n_events") - F.col("mean_events"))
                        / F.col("sd_events"), 6).alias("zscore"))
    )


def stream_heavy_hitters(spark: SparkSession, path: str,
                         capacity: int = 256,
                         n_buckets: int = 8,
                         text_col: str = "text",
                         max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming Misra–Gries heavy hitters — the streaming twin of
    ``pipeline.sketches.heavy_hitters`` and the algorithm's NATIVE
    setting (Misra & Gries '82 is a one-pass stream summary).

    Topology: tokens hash into ``n_buckets`` groups (each token lives in
    exactly ONE bucket, so a per-bucket summary is a partition-level MG
    pass over a token-disjoint slice — the mergeable-summaries form);
    each bucket's ``GroupState`` holds its MG summary, HARD-BOUNDED at
    ``capacity`` (token, count) pairs no matter how many tokens stream
    by — the entire job state is n_buckets·capacity rows, forever.  The
    per-batch fold is the batch op's vectorized value_counts + bulk
    decrement, never per-row Python.

    Emits every bucket's full summary each micro-batch (update mode):
    (bucket, token, est, bucket_tokens_seen).  MG guarantees per bucket:
    true_count − N_b/(capacity+1) ≤ est ≤ true_count, and every token
    with true_count > N_b/(capacity+1) is present — the exact-recount
    refinement stays a batch job over the emitted survivor set (the
    batch op's second phase), which is how the lambda-architecture pair
    is meant to compose.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(path)
    from graph_python_spark.functions.digest import md5_bucket

    toks = (
        docs.select(F.explode(F.filter(F.split(F.col(text_col), " "),
                                       lambda t: t != "")).alias("token"))
        .select("token", md5_bucket(F.col("token"), n_buckets).alias("bucket"))
    )
    cap = int(capacity)
    out_schema = T.StructType([
        T.StructField("bucket", T.LongType()),
        T.StructField("token", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("bucket_tokens_seen", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seen", T.LongType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (bucket,) = key
        # counts stay int64 end-to-end: an unbounded stream accumulates
        # per-bucket counts past 2^53, where float64 silently rounds and
        # quietly breaks the est <= true_count guarantee (ADVICE r4).
        # NOTE pd.Series.add(fill_value=0) promotes through float64 on
        # any index misalignment (new token in a batch — the common
        # case), so both operands are reindexed onto the union index
        # with an int64 fill FIRST; int64 + int64 stays exact.
        if state.exists:
            tokens, counts, seen = state.get
            s = pd.Series(list(counts), index=list(tokens), dtype="int64")
        else:
            s, seen = None, 0
        for pdf in pdfs:
            vc = pdf["token"].value_counts()
            seen += int(vc.sum())
            if s is None:
                s = vc
            else:
                union = s.index.union(vc.index)
                s = (s.reindex(union, fill_value=0)
                     + vc.reindex(union, fill_value=0))
            if len(s) > cap:
                thr = s.nlargest(cap + 1).iloc[-1]
                s = s[s > thr] - thr
        # ALWAYS persist, even when the bulk decrement emptied the
        # summary (an all-singleton batch can) — `seen` is the error-
        # bound accounting and must accumulate across every batch
        if s is None:
            s = pd.Series([], dtype="int64")
        state.update((list(s.index.astype(str)),
                      [int(x) for x in s.to_numpy()], int(seen)))
        if len(s):
            yield pd.DataFrame({
                "bucket": bucket,
                "token": s.index.astype(str),
                "est": s.to_numpy().astype("int64"),
                "bucket_tokens_seen": int(seen),
            })

    return toks.groupBy("bucket").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)
