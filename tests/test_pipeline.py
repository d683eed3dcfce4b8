"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from graph_python_spark.pipeline import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),   # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog", "en", "s", 42),     # near dup
        (3, "el gato de la casa que come pescado", "es", "s", 36),
        (4, "der hund ist und die katze ist da", "de", "s", 33),
        (5, "completely different words here about spark engines", "en", "s", 52),
        (6, "zzz", "und", "s", 3),
        (7, "", "und", "s", 0),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 0 and groups[0]["n_docs"] == 2


def test_token_jaccard_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"])
             for r in dedup.token_jaccard_pairs(docs, 1, 2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)][0] == pairs[(0, 1)][1]  # jaccard 1
    assert (0, 2) in pairs  # near dup passes 0.5
    assert all(a != 5 and b != 5 for a, b in pairs)  # unrelated doc pairs with nothing


def test_minhash_lsh_finds_exact_and_near(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs                 # identical docs always collide
    assert all(a < b for a, b in pairs)


def test_minhash_signatures_deterministic(docs, spark):
    s1 = dedup.minhash_signatures(docs).orderBy("doc_id").collect()
    s2 = dedup.minhash_signatures(docs).orderBy("doc_id").collect()
    assert s1 == s2
    by_id = {r["doc_id"]: r for r in s1}
    assert by_id[0]["mh0"] == by_id[1]["mh0"]  # identical text, identical sig


def test_simhash(docs):
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sig[0] == sig[1]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(docs, blocks=8, max_hamming=7).collect()}
    assert pairs.get((0, 1)) == 0
    # pigeonhole exactness: banded candidates recover every pair a brute
    # force Hamming scan finds when max_hamming < blocks
    sigs = sorted(sig.items())
    brute = {
        (a, b): bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
        for ai, (a, sa) in enumerate(sigs) for (b, sb) in sigs[ai + 1:]
        if bin((sa ^ sb) & ((1 << 64) - 1)).count("1") <= 7
    }
    assert pairs == brute


def test_text_stats_and_lang(docs):
    stats = {r["doc_id"]: r for r in text.token_stats(docs).collect()}
    assert stats[0]["n_tokens"] == 9
    assert stats[0]["n_distinct_tokens"] == 8  # 'the' twice
    assert stats[7]["n_tokens"] == 0
    lang = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert lang[0] == "en" and lang[3] == "es" and lang[4] == "de"
    assert lang[6] == "und"
    q = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert q[0]["stop_ratio"] == pytest.approx(2 / 9, abs=1e-6)
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    assert fp[0] == fp[1]      # identical docs: identical fingerprint
    assert fp[0] != fp[5]      # unrelated doc: different fingerprint
    assert fp[6] is not None  # single-token doc falls back to unigram hash


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # closest to 0
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.9, 0.1], 1),   # closest to 2
        (4, [-1.0, 0.0, 0.0], 2),  # anti-parallel to 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.cosine_topk(emb, query_ids=[0, 2], k=2)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    assert got[(0, 1)] == 1 and got[(2, 1)] == 3
    sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in out.collect()}
    assert sims[(0, 1)] == pytest.approx(0.9 / (0.9055385138137417), abs=1e-5)


def test_lsh_and_ivf_rank_identical_vector_first(spark):
    import math

    rows = []
    for k in range(40):
        ang = k * 0.17
        rows.append((k, [math.cos(ang), math.sin(ang), 0.1 * (k % 3)], 0))
    rows.append((100, rows[5][1], 1))  # exact copy of vec 5
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.lsh_cosine_topk(emb, query_ids=[5], dim=3, k=3, planes=4)
    got = {r["rank"]: r["neighbor_id"] for r in out.collect()}
    assert got[1] == 100  # the identical vector shares every bucket
    out = similarity.ivf_topk(emb, query_ids=[5], k=3, n_cells=4, n_probe=2)
    got = {r["rank"]: r["neighbor_id"] for r in out.collect()}
    assert got[1] == 100


def test_multimodal_features_and_stubs(spark):
    media = multimodal.synthetic_media(spark, n=12)
    feats = multimodal.extract_features(media, dim=4).orderBy("media_id").collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == 4 for r in feats)
    assert feats[1]["n_bytes"] == len(multimodal.synthetic_media(spark, n=2).collect()[1]["payload"])
    # deterministic across runs
    again = multimodal.extract_features(media, dim=4).orderBy("media_id").collect()
    assert [r["feature"] for r in feats] == [r["feature"] for r in again]
    # frame sampling plan is JVM-side and real
    fs = {r["media_id"]: list(r["frame_indices"])
          for r in multimodal.frame_sample(media, every_n=30).collect()}
    assert all(ix == list(range(0, 120, 30)) for ix in fs.values())
    # resize: real Arrow plumbing, deterministic fake codec (set_resizer
    # installs a real one); images get width*height payloads + updated meta,
    # non-image rows pass through untouched
    resized = {r["media_id"]: r for r in
               multimodal.resize_images(media, 8, 4).collect()}
    orig = {r["media_id"]: r for r in media.collect()}
    for mid, r in resized.items():
        if r["kind"] == "image":
            assert len(r["payload"]) == 32
            assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        else:
            assert r["payload"] == orig[mid]["payload"]
            assert r["meta"] == orig[mid]["meta"]
    again = {r["media_id"]: r["payload"] for r in
             multimodal.resize_images(media, 8, 4).collect()}
    assert {m: r["payload"] for m, r in resized.items()} == again


def test_streaming_windowed_and_degree(spark, tmp_path):
    from graph_python_spark.streaming import stream_degree_counts, stream_windowed_events
    from graph_python_spark.streaming.streams import run_to_memory

    events = spark.createDataFrame(
        [(k, f"2024-01-01 0{k % 3}:10:00", k % 4, "click" if k % 2 else "view",
          float(k), "{}") for k in range(30)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
             "event_type", "value", "props")
    path = str(tmp_path / "events")
    events.write.parquet(path)

    # update mode: append would hold results until the watermark passes the
    # last window, which never happens on a bounded directory
    agg = stream_windowed_events(spark, path, window="1 hour")
    run_to_memory(agg, "win_out", "update")
    got = spark.sql("SELECT * FROM win_out").collect()
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n")).collect()
    )
    assert len(got) == len(batch) > 0

    edges = spark.createDataFrame(
        [(k % 5, k, "2024-01-01 00:00:00") for k in range(50)],
        "src long, dst long, ts string",
    ).select("src", "dst", F.col("ts").cast("timestamp").alias("ts"))
    epath = str(tmp_path / "edges")
    edges.write.parquet(epath)
    deg = stream_degree_counts(spark, epath)
    run_to_memory(deg, "deg_out", "complete")
    got = {r["src"]: r["out_degree"] for r in spark.sql("SELECT * FROM deg_out").collect()}
    assert got == {k: 10 for k in range(5)}


def test_bpe_token_stats(docs):
    s = {r["doc_id"]: r for r in text.bpe_token_stats(docs).collect()}
    assert s[0]["n_bpe_tokens"] == 9 and s[0]["n_alpha"] == 9
    assert s[0]["n_num"] == 0 and s[0]["n_distinct"] == 8
    assert s[7]["n_bpe_tokens"] == 0


def test_cosine_near_dup(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.01], 0),   # cos ~0.99995 with 0
        (2, [0.0, 1.0], 1),    # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["doc_a"], r["doc_b"]): r["cos_sim"]
             for r in similarity.cosine_near_dup(emb, threshold=0.9, dim=2).collect()}
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] > 0.999


def test_cosine_near_dup_lsh_recall(spark):
    # banded LSH path vs the exact all-pairs baseline on the sf0.001
    # embeddings: every LSH pair must be a true pair (precision 1 by
    # construction — same exact filter), and recall at this threshold must
    # be total on the fixture
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["doc_a"], r["doc_b"]) for r in similarity.cosine_near_dup(
        emb, threshold=0.45, dim=64, method="exact").collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in similarity.cosine_near_dup(
        emb, threshold=0.45, dim=64, bands=8, band_bits=4).collect()}
    assert lsh <= exact
    assert len(exact) > 0
    assert len(lsh) / len(exact) == 1.0


def test_derived_band_bits_scaling():
    # constant expected bucket size: bits grow with log2(n), floored at the
    # static r1/r2 default (4) and capped at 16
    from graph_python_spark.pipeline.similarity import derived_band_bits

    assert derived_band_bits(10) == 4
    assert derived_band_bits(64) == 4
    assert derived_band_bits(1024) == 4
    assert derived_band_bits(10_000) == 8          # ceil(log2(156.25))
    assert derived_band_bits(1_000_000) == 14      # ceil(log2(15625))
    assert derived_band_bits(10**10) == 16         # capped
    # monotone non-decreasing in n
    bits = [derived_band_bits(n) for n in (1, 10, 10**3, 10**5, 10**7, 10**9)]
    assert bits == sorted(bits)


def test_lsh_bucket_cap_on_skewed_fixture(spark):
    # 300 IDENTICAL vectors (they collide in EVERY band — the quadratic
    # pathology the cap exists for) + 60 distinct ones.  After the cap no
    # surviving bucket exceeds the bound, and derived-banding near-dup
    # still completes with bounded candidate pairs instead of 300² per band.
    from graph_python_spark.pipeline.similarity import (
        _cap_buckets, cosine_near_dup, lsh_band_buckets)

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(300)]
    rows += [(300 + i, [0.0, 1.0, float(i % 7) / 7.0, float(i % 11) / 11.0])
             for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    bb = lsh_band_buckets(emb, dim=4, bands=4, band_bits=4)
    capped = _cap_buckets(bb, max_rows=100)
    sizes = [r["c"] for r in capped.groupBy("band", "bucket")
             .agg(F.count("*").alias("c")).collect()]
    assert sizes and max(sizes) <= 100
    # the identical-vector bucket was dropped from every band
    assert capped.filter(F.col("id") < 300).count() == 0

    pairs = cosine_near_dup(emb, threshold=0.9, dim=4, bands=4,
                            band_bits=None, max_bucket_rows=100)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # no pair from the dropped identical block; any surviving pair is a
    # true near-dup among the distinct block
    assert all(a >= 300 and b >= 300 for a, b in got)


def test_streaming_stateful_user_stats(spark, tmp_path):
    from graph_python_spark.streaming.streams import run_to_memory, stream_user_stats

    events = spark.createDataFrame(
        [(k, f"2024-01-01 00:{k:02d}:00", k % 3, "click", float(k), "{}")
         for k in range(12)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
             "event_type", "value", "props")
    path = str(tmp_path / "sevents")
    events.write.parquet(path)

    out = stream_user_stats(spark, path)
    run_to_memory(out, "ustats", "update")
    # last emitted row per user holds the final running aggregate
    got = {r["user_id"]: r for r in spark.sql(
        """SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) AS rn
             FROM ustats) WHERE rn = 1"""
    ).collect()}
    assert got[0]["n_events"] == 4 and got[0]["total_value"] == 0 + 3 + 6 + 9
    assert got[1]["n_events"] == 4 and got[2]["n_events"] == 4
    assert got[0]["first_ts"].minute == 0 and got[0]["last_ts"].minute == 9


def test_streaming_dedup_exact(spark, tmp_path):
    from graph_python_spark.streaming.streams import run_to_memory, stream_dedup_exact

    docs = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", "aaa"),
         (1, "2024-01-01 00:01:00", "bbb"),
         (2, "2024-01-01 00:02:00", "aaa"),   # dup of 0
         (3, "2024-01-01 00:03:00", "ccc"),
         (4, "2024-01-01 00:04:00", "bbb")],  # dup of 1
        "doc_id long, ts string, text string",
    ).select("doc_id", F.col("ts").cast("timestamp").alias("ts"), "text")
    path = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(path)
    out = stream_dedup_exact(spark, path, watermark="10 minutes")
    run_to_memory(out, "dedup_stream", "append")
    rows = spark.sql("SELECT doc_id FROM dedup_stream").collect()
    kept = sorted(r["doc_id"] for r in rows)
    # one survivor per distinct text
    assert len(kept) == 3
    assert 3 in kept


def test_stratified_sample_deterministic(spark):
    from graph_python_spark.pipeline.sampling import (deterministic_sample,
                                                      stratified_sample)

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = stratified_sample(df, "lang", "doc_id", 7)
    s2 = stratified_sample(df.repartition(13), "lang", "doc_id", 7)
    a = sorted((r["doc_id"], r["lang"], r["sample_rank"]) for r in s1.collect())
    b = sorted((r["doc_id"], r["lang"], r["sample_rank"]) for r in s2.collect())
    assert a == b  # pure function of the data, not the partitioning
    per_lang = {}
    for _, lang, rank in a:
        per_lang.setdefault(lang, []).append(rank)
    assert all(sorted(v) == list(range(1, 8)) for v in per_lang.values())

    g1 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 10).collect()}
    g2 = {r["doc_id"] for r in
          deterministic_sample(df.repartition(5), "doc_id", 10).collect()}
    assert g1 == g2 and len(g1) == 10


def test_near_dup_clusters(spark):
    from graph_python_spark.pipeline.dedup import near_dup_clusters

    # two chains {1,2,3}, {10,11} and their sizes; canonical = min id
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    got = sorted((r["doc_id"], r["canonical_id"], r["cluster_size"])
                 for r in near_dup_clusters(pairs).collect())
    assert got == [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)]


def test_streaming_dedup_minhash(spark, tmp_path):
    from graph_python_spark.streaming.streams import (minhash_sig_cols,
                                                      run_to_memory,
                                                      stream_dedup_minhash)

    docs = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", "the quick brown fox"),
         (1, "2024-01-01 00:01:00", "an entirely different document"),
         (2, "2024-01-01 00:02:00", "quick brown the fox"),      # reorder of 0
         (3, "2024-01-01 00:03:00", "the quick  brown fox the"), # dups/space of 0
         (4, "2024-01-01 00:04:00", "a third unrelated text")],
        "doc_id long, ts string, text string",
    ).select("doc_id", F.col("ts").cast("timestamp").alias("ts"), "text")
    path = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(path)

    # row-expression signatures must equal the batch explode+groupBy ones
    from graph_python_spark.pipeline.dedup import minhash_signatures
    row_sigs = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
                for r in docs.select("doc_id", *minhash_sig_cols(8)).collect()}
    batch_sigs = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
                  for r in minhash_signatures(docs).collect()}
    assert row_sigs == batch_sigs

    out = stream_dedup_minhash(spark, path, watermark="10 minutes")
    run_to_memory(out, "mh_stream", "append")
    kept = sorted(r["doc_id"]
                  for r in spark.sql("SELECT doc_id FROM mh_stream").collect())
    # 2 and 3 share doc 0's token set -> same signature -> dropped
    assert kept == [0, 1, 4]


def test_repetition_stats(spark):
    from graph_python_spark.pipeline.text import repetition_stats

    docs = spark.createDataFrame(
        [(0, "a a a a"),                 # one token repeated
         (1, "x y z w"),                 # all distinct
         (2, "a b a b a b"),             # repeated bigram
         (3, "")],                       # empty
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["n_tokens"] == 4
    assert got[0]["distinct_ratio"] == 0.25
    assert got[0]["top_tok_ratio"] == 1.0
    assert got[0]["dup_bigram_ratio"] == round(1 - 1 / 3, 6)
    assert got[1]["distinct_ratio"] == 1.0
    assert got[1]["top_tok_ratio"] == 0.25
    assert got[1]["dup_bigram_ratio"] == 0.0
    # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> 2 distinct of 5
    assert got[2]["dup_bigram_ratio"] == round(1 - 2 / 5, 6)
    assert got[3]["n_tokens"] == 0
    assert got[3]["distinct_ratio"] == 0.0


def test_pii_scrub(spark):
    import hashlib
    import re

    from graph_python_spark.pipeline.text import (PII_EMAIL, PII_IPV4,
                                                  PII_PHONE, pii_scrub)

    texts = {
        0: "contact me at john.doe+spam@example.co.uk or +4915112345678",
        1: "server 10.0.0.1 and 192.168.255.255 reachable; not 1.2.3",
        2: "no pii here at all",
        3: "a@b.io b@c.net 127.0.0.1 +1234567",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    for i, txt in texts.items():
        assert got[i]["n_emails"] == len(re.findall(PII_EMAIL, txt)), i
        assert got[i]["n_ipv4"] == len(re.findall(PII_IPV4, txt)), i
        assert got[i]["n_phones"] == len(re.findall(PII_PHONE, txt)), i
        red = re.sub(PII_PHONE, "<PHONE>",
                     re.sub(PII_IPV4, "<IP>",
                            re.sub(PII_EMAIL, "<EMAIL>", txt)))
        assert got[i]["redacted_md5"] == hashlib.md5(red.encode()).hexdigest(), i
    assert got[0]["n_emails"] == 1 and got[0]["n_phones"] == 1
    assert got[1]["n_ipv4"] == 2
    assert got[3]["n_emails"] == 2 and got[3]["n_ipv4"] == 1 and got[3]["n_phones"] == 1


def test_kmeans_fixed(spark):
    import hashlib

    import numpy as np

    from graph_python_spark.pipeline.similarity import KMEANS_SCALE, kmeans_fixed

    rng = np.random.RandomState(3)
    n, dim, k, iters = 40, 6, 3, 2
    X = rng.randn(n, dim).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["cluster"], r["dist2"])
           for r in kmeans_fixed(df, k=k, iterations=iters).collect()}

    # NumPy replay of the quantized Lloyd loop
    order = sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = X[order[:k]].astype(np.float64)

    def assign(C):
        pp = (X.astype(np.float64) ** 2).sum(1)
        cc = (C ** 2).sum(1)
        d2 = pp[:, None] - 2.0 * X.astype(np.float64) @ C.T + cc[None, :]
        return d2.argmin(1), d2.min(1)  # argmin ties -> smallest cid (numpy)

    for _ in range(iters):
        a, _ = assign(cents)
        new = np.zeros((k, dim))
        for c in range(k):
            members = X[a == c].astype(np.float64)
            q = np.round(members * KMEANS_SCALE).astype(np.int64)
            new[c] = q.sum(0) / (len(members) * KMEANS_SCALE)
        cents = new
    a, d2 = assign(cents)
    for i in range(n):
        assert got[i][0] == a[i], i
        assert abs(got[i][1] - round(float(d2[i]), 6)) < 2e-6, i


def test_weighted_sample(spark):
    from graph_python_spark.pipeline.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1000.0 if i < 10 else 1.0) for i in range(500)], "id long, w double")
    # partition-invariant and reproducible
    s1 = sorted(r["id"] for r in weighted_sample(df, "id", "w", 50).collect())
    s2 = sorted(r["id"] for r in weighted_sample(df.repartition(7), "id", "w", 50).collect())
    assert s1 == s2 and len(s1) == 50
    # 1000x-weight rows all make a 10%-cut sample (P(miss) ~ (q/1000)^heavy)
    assert set(range(10)) <= set(s1)
    # priority sampling replay: q = w/u with the same unit hash
    got = set(s1)
    P, M = 1000003, 1000000007
    pri = {i: (1000.0 if i < 10 else 1.0)
           / (((((i * P + 17) % M) * P + 99991) % M + 1) / M)
           for i in range(500)}
    want = set(sorted(pri, key=lambda i: (-pri[i], i))[:50])
    assert got == want
    # zero-weight rows are never taken before positive ones
    dfz = spark.createDataFrame([(i, 0.0 if i < 490 else 1.0) for i in range(500)],
                                "id long, w double")
    sz = {r["id"] for r in weighted_sample(dfz, "id", "w", 10).collect()}
    assert sz == set(range(490, 500))


def test_rebalance_sources(spark):
    from graph_python_spark.pipeline.sampling import rebalance_sources

    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(4000)], "id long, src string")
    fr = {"s0": 0.0, "s1": 0.25, "s2": 1.0}
    kept = rebalance_sources(df, "src", "id", fr, default_fraction=0.5)
    counts = {r["src"]: r["n"] for r in
              kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert "s0" not in counts                      # fraction 0 drops all
    assert counts["s2"] == 1000                    # fraction 1 keeps all
    assert abs(counts["s1"] - 250) < 80            # ~25% of 1000
    assert abs(counts["s3"] - 500) < 100           # default 0.5
    # decision is a pure function of (key, source): partition-invariant
    k2 = {r["id"] for r in rebalance_sources(df.repartition(11), "src", "id", fr,
                                             default_fraction=0.5).collect()}
    assert k2 == {r["id"] for r in kept.collect()}
    # zero shuffles: the filter stays in the scan stage
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
