"""Corpus generation + edge extraction: determinism, sha256 invariance
(BASELINE.json input_hint), dictionary density, skew shape."""

import hashlib

from pyspark.sql import functions as F

from graph_python_spark.sources.corpus import (
    content_sha256,
    extract_edges,
    generate_corpus,
    scale_fixture_edges,
    vertex_dictionary,
)


def test_corpus_schema_and_determinism(spark):
    c1 = generate_corpus(spark, n_repos=4, files_per_repo=4).orderBy("repo", "path")
    c2 = generate_corpus(spark, n_repos=4, files_per_repo=4).orderBy("repo", "path")
    assert c1.columns == ["repo", "path", "commit", "lang", "content"]
    rows1, rows2 = c1.collect(), c2.collect()
    assert rows1 == rows2
    assert len(rows1) == 16
    # commit is the stable pseudo-hash of repo/path
    for r in rows1:
        want = hashlib.sha256(f"{r['repo']}/{r['path']}".encode()).hexdigest()[:40]
        assert r["commit"] == want


def test_sha256_invariance_through_extraction(spark):
    """input_hint: any engine transformation preserves sha256(content)."""
    corpus = generate_corpus(spark, n_repos=4, files_per_repo=4).cache()
    before = {(r["repo"], r["path"]): r["sha"] for r in content_sha256(corpus).collect()}
    verts = vertex_dictionary(corpus)
    edges = extract_edges(corpus, verts)
    edges.count()  # force the full extraction pipeline
    after = {(r["repo"], r["path"]): r["sha"] for r in content_sha256(corpus).collect()}
    assert before == after
    # and the driver-side recomputation agrees (no engine-side mutation)
    for r in corpus.collect():
        assert hashlib.sha256(r["content"].encode()).hexdigest() == before[(r["repo"], r["path"])]


def test_vertex_dictionary_dense_and_sorted(spark):
    corpus = generate_corpus(spark, n_repos=3, files_per_repo=5)
    verts = vertex_dictionary(corpus).orderBy("id").collect()
    assert [v["id"] for v in verts] == list(range(15))
    keys = [(v["repo"], v["path"]) for v in verts]
    assert keys == sorted(keys)


def test_extracted_edges_match_content(spark):
    """Every extracted edge corresponds to an import line and vice versa."""
    corpus = generate_corpus(spark, n_repos=4, files_per_repo=4).cache()
    verts = vertex_dictionary(corpus)
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in extract_edges(corpus, verts).collect()
    }
    # reparse driver-side
    want = {}
    import re

    id_of = {(v["repo"], v["path"]): v["id"] for v in verts.collect()}
    for r in corpus.collect():
        if r["lang"] != "python":
            continue
        src = id_of[(r["repo"], r["path"])]
        for m in re.finditer(r"import (repo\d{5})\.(m\d{4})", r["content"]):
            dst = id_of[(m.group(1), f"src/{m.group(2)}.py")]
            if src != dst:
                want[(src, dst)] = want.get((src, dst), 0) + 1.0
    assert got == want
    assert len(got) > 10


def test_md_rows_have_no_imports(spark):
    corpus = generate_corpus(spark, n_repos=8, files_per_repo=8)
    md = corpus.filter(F.col("lang") == "md")
    assert md.count() > 0
    assert md.filter(F.col("content").contains("import ")).count() == 0


def test_scale_fixture_skew(spark):
    e = scale_fixture_edges(spark, 5000)
    n = e.count()
    assert n > 5000
    deg = e.groupBy("src").count()
    mx = deg.agg(F.max("count")).first()[0]
    assert mx >= 32  # heavy tail present
    assert e.filter(F.col("src") == F.col("dst")).count() == 0


def test_read_corpus_parquet_roundtrip(spark, tmp_path):
    from graph_python_spark.sources.corpus import read_corpus

    corpus = generate_corpus(spark, n_repos=4, files_per_repo=4)
    path = str(tmp_path / "corpus_pq")
    # extra column must be pruned away by the reader's input_hint projection
    corpus.withColumn("extra", F.lit(1)).write.parquet(path)
    back = read_corpus(spark, path)
    assert back.columns == ["repo", "path", "commit", "lang", "content"]
    assert back.count() == corpus.count()
