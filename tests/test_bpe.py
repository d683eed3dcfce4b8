"""BPE merge training — differential vs a pure-Python reference
implementation (Sennrich-style: word-type histogram, adjacent-pair counts
with overlaps, greedy left-to-right merge application)."""

import random
from collections import Counter

from graph_python_spark.pipeline.text import bpe_train


def py_bpe(texts, merges):
    wf = Counter(w for t in texts for w in t.split(" ") if w and "|" not in w)
    vocab = {tuple(w): f for w, f in wf.items()}
    out = []
    for step in range(1, merges + 1):
        pc = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, c))
        new = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new[key] = new.get(key, 0) + f
        vocab = new
    return out


def run_spark(spark, texts, merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return [(r["step"], r["left"], r["right"], r["pair_count"])
            for r in bpe_train(docs, merges=merges)
            .orderBy("step").collect()]


def test_bpe_train_simple(spark):
    texts = ["low low low lower lower newest newest newest newest widest"]
    assert run_spark(spark, texts, 6) == py_bpe(texts, 6)


def test_bpe_train_overlap_and_ties(spark):
    # 'aaaa' exercises overlapping pair counts + greedy left-to-right
    # merges; tie-breaks hit the (left, right) ordering
    texts = ["aaaa aaaa bb bb cc cc", "ab ab ba ba", "aaaa bb"]
    assert run_spark(spark, texts, 8) == py_bpe(texts, 8)


def test_bpe_train_random_differential(spark):
    rng = random.Random(3)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(200)]
    texts = [" ".join(rng.choice(words) for _ in range(30))
             for _ in range(40)]
    assert run_spark(spark, texts, 10) == py_bpe(texts, 10)
