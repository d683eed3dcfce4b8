"""DSIR importance weights (Xie et al. NeurIPS'23) — pure-Python replay
differential plus the selection property the op exists for: documents
drawn from the target distribution outscore the rest."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from graph_python_spark.pipeline.sampling import dsir_weights

B = 64
SM = 1.0


def py_dsir(rows):
    """rows: (doc_id, text, is_target) -> {doc_id: (n_grams, log_w)}."""
    def grams(text):
        toks = [w for w in text.split(" ") if w]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    cr, ct = {}, {}
    for _, text, t in rows:
        for g in grams(text):
            h = bucket(g)
            cr[h] = cr.get(h, 0) + 1
            if t:
                ct[h] = ct.get(h, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    lam = {h: math.log((ct.get(h, 0) + SM) / (nt + SM * B))
           - math.log((cr[h] + SM) / (nr + SM * B)) for h in cr}
    out = {}
    for doc_id, text, t in rows:
        gs = grams(text)
        s = sum(round(lam[bucket(g)] * 1e9) for g in gs)
        out[doc_id] = (len(gs), round(s / 1e9, 6))
    return out


def test_dsir_matches_python_replay(spark):
    rows = [
        (0, "the cat sat on the mat", True),
        (1, "the dog sat on the log", True),
        (2, "le chat est sur le tapis", False),
        (3, "der hund sitzt auf dem baum", False),
        (4, "the cat and the dog", True),
        (5, "", False),
        (6, "单 字", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    got = {r["doc_id"]: (r["n_grams"], r["log_weight"], r["is_target"])
           for r in dsir_weights(df, "t", n_buckets=B,
                                 smoothing=SM).collect()}
    want = py_dsir(rows)
    assert set(got) == {r[0] for r in rows}
    for doc_id, text, t in rows:
        n, w = want[doc_id]
        assert got[doc_id] == (n, pytest.approx(w, abs=2e-9), t), \
            (doc_id, got[doc_id], (n, w))
    # empty doc: zero grams, zero weight
    assert got[5] == (0, 0.0, False)


def test_dsir_selects_target_like_docs(spark):
    # 30 English-ish target docs, 30 French-ish raw-only docs, plus 10
    # held-out English-ish docs NOT marked target: DSIR must rank the
    # held-out English docs above the French ones
    en = ["the quick brown fox jumps over the lazy dog",
          "a stitch in time saves nine every day",
          "all that glitters is not gold they say"]
    fr = ["le renard brun saute par dessus le chien",
          "un point a temps en vaut neuf chaque jour",
          "tout ce qui brille n est pas or dit on"]
    rows = []
    for k in range(30):
        rows.append((k, en[k % 3], True))
        rows.append((100 + k, fr[k % 3], False))
    for k in range(10):
        rows.append((200 + k, en[k % 3], False))     # held-out English
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    got = {r["doc_id"]: r["log_weight"]
           for r in dsir_weights(df, "t", n_buckets=2048).collect()}
    held = [got[200 + k] for k in range(10)]
    french = [got[100 + k] for k in range(30)]
    assert min(held) > max(french)
