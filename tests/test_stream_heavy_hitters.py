"""Streaming Misra-Gries heavy hitters — parity vs the batch operator's
guarantees on a bounded stream driven across multiple micro-batches:
every true per-bucket heavy hitter survives, estimates are true-count
lower bounds within the N_b/(capacity+1) MG error, and job state stays
hard-bounded at n_buckets x capacity rows."""

import hashlib

import pytest
from pyspark.sql import functions as F

from graph_python_spark.streaming.streams import (run_to_memory,
                                                  stream_heavy_hitters)

CAP = 8
BUCKETS = 4


def bucket_of(token: str) -> int:
    # mirrors the engine: conv(substr(md5(token),1,15),16,10) % n_buckets
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % BUCKETS


def heavy_tokens_per_bucket():
    """Two deterministic heavy tokens for EVERY bucket, found by probing
    the shared hash — guarantees each bucket has a nonempty summary in
    the final batch (so its last emission covers its whole stream)."""
    per = {b: [] for b in range(BUCKETS)}
    k = 0
    while any(len(v) < 2 for v in per.values()):
        tok = f"h{k}"
        b = bucket_of(tok)
        if len(per[b]) < 2:
            per[b].append(tok)
        k += 1
    return per


def test_stream_heavy_hitters_mg_guarantees(spark, tmp_path):
    per = heavy_tokens_per_bucket()
    heavies = [t for v in per.values() for t in v]
    # three files -> three micro-batches: heavy tokens appear in EVERY
    # batch (40/12 heavy occurrences) over a rotating singleton tail
    texts = []
    for batch in range(3):
        words = []
        for tok in heavies:
            words += [tok] * (14 - 3 * batch)
        words += [f"s{batch}_{k}" for k in range(30)]
        texts.append(" ".join(words))

    path = str(tmp_path / "hh_docs")
    for k, text in enumerate(texts):
        (spark.createDataFrame([(k, text)], "doc_id long, text string")
         .select("doc_id", F.timestamp_seconds(F.lit(1000 + k)).alias("ts"),
                 "text")
         .coalesce(1).write.mode("append").parquet(path))

    out = stream_heavy_hitters(spark, path, capacity=CAP, n_buckets=BUCKETS,
                               max_files_per_trigger=1)
    run_to_memory(out, "shh", "update")
    rows = spark.sql("SELECT * FROM shh").collect()
    assert rows, "stream emitted nothing"

    # truth per bucket over the full stream
    all_tokens = " ".join(texts).split(" ")
    true, n_b = {}, {}
    for t in all_tokens:
        b = bucket_of(t)
        true[(b, t)] = true.get((b, t), 0) + 1
        n_b[b] = n_b.get(b, 0) + 1

    final = {}
    for r in rows:
        final.setdefault(r["bucket"], []).append(r)
    assert set(final) == set(range(BUCKETS))
    for b in final:
        mx = max(r["bucket_tokens_seen"] for r in final[b])
        final[b] = [r for r in final[b] if r["bucket_tokens_seen"] == mx]

    for b, rs in final.items():
        # heavy tokens appear in the last batch, so the final emission's
        # accounting covers the bucket's ENTIRE stream
        assert rs[0]["bucket_tokens_seen"] == n_b[b], (b, rs[0], n_b[b])
        assert len(rs) <= CAP, f"bucket {b} summary exceeds capacity"
        est = {r["token"]: r["est"] for r in rs}
        err = n_b[b] / (CAP + 1)
        for tok, e in est.items():
            t = true[(b, tok)]
            assert e <= t, (tok, e, t)
            assert t - e <= err, (tok, e, t, err)
        # every true heavy hitter (count > N_b/(cap+1)) must survive
        for (bb, tok), t in true.items():
            if bb == b and t > err:
                assert tok in est, (b, tok, t, err)
        # the constructed heavies for this bucket must be reported
        for tok in per[b]:
            assert tok in est, (b, tok)
