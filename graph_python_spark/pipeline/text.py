"""Text analysis for training-data pipelines: tokenization, language ID,
quality scoring, fingerprinting.

All operators are pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage codegen; no Python in the hot path) over a documents table
``(doc_id: long, text: string, ...)``, so they hold at 100 TB: every one is
a single projection or one groupBy away from the scan, with the text column
pruned out as soon as tokens are derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# deterministic marker-token sets for the n-gram language heuristic;
# kept tiny so the same sets can be inlined into the DuckDB oracle SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "les", "et", "est"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "is", "a", "to", "in", "on", "for", "with",
)


def tokens_col(text_col: str = "text"):
    """Whitespace tokens, empties dropped (split keeps them)."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token + char counts per document (token counting operator)."""
    return docs.select(
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(tokens_col())).cast("long").alias("n_distinct_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality: length, punctuation density, stopword ratio.

    score = stop_ratio - punct_ratio + min(n_tokens, 64)/64, rounded 1e-6.
    """
    toks = tokens_col()
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length("text") - F.length(F.regexp_replace(F.col("text"), r"[.,;:!?]", ""))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(F.length("text") > 0,
                         n_punct.cast("double") / F.length("text")).otherwise(F.lit(0.0))
    length_term = F.least(n_tokens, F.lit(64)).cast("double") / F.lit(64.0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio - punct_ratio + length_term, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-token language heuristic: argmax of marker hits per language,
    deterministic tie-break = lexicographically smallest language code;
    'und' when no markers hit at all."""
    toks = tokens_col()

    def marker_pred(markers):
        # single-arg lambda: a 2-arg lambda would be read as (element, index)
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    # argmax with smallest-lang tie-break: CASE through languages in sorted
    # order, first one matching the max wins
    hit_counts = [scores[lang] for lang in sorted(LANG_MARKERS)]
    max_hits = F.greatest(*hit_counts)
    pred = F.when(max_hits == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        pred = pred.when(scores[lang] == max_hits, F.lit(lang))
    return docs.select(
        "doc_id",
        *[scores[lang].cast("long").alias(f"hits_{lang}") for lang in sorted(LANG_MARKERS)],
        pred.alias("pred_lang"),
    )


# BPE-ish pre-tokenization classes: alpha runs, digit runs, single symbols.
# Same RE2/Java-compatible pattern is inlined into the DuckDB oracle.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex (alpha / numeric /
    symbol classes) — the coarse "how many tokens will the trainer see"
    estimator. Pure regexp_extract_all projection, codegen'd JVM-side."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))).cast("long").alias("n_alpha"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))).cast("long").alias("n_num"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetition / boilerplate metrics — the standard pre-training quality
    gates (Rae et al. Gopher rules): per document,

      * ``distinct_ratio``   — |distinct tokens| / |tokens|
      * ``top_tok_ratio``    — occurrences of the most frequent token / |tokens|
      * ``dup_bigram_ratio`` — 1 − |distinct bigrams| / |bigrams|

    Token mode goes through one explode + two partial-aggregated groupBys
    (the only shuffles); bigrams stay array-local via sequence/transform
    expressions.  Zero tokens → all ratios 0.
    """
    base = docs.select("doc_id", tokens_col().alias("toks"))
    # mode frequency: explode -> count per (doc, tok) -> max per doc
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("_c"))
        .groupBy("doc_id").agg(F.max("_c").alias("_top"))
    )
    # NB: Spark's sequence(1, 0) steps BACKWARDS ([1, 0]) instead of being
    # empty, so docs with < 2 tokens need the explicit empty-array branch
    bigrams = F.expr(
        "CASE WHEN size(toks) < 2 THEN array()"
        " ELSE transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END")
    arr = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("_nd"),
        F.size(bigrams).alias("_nb"),
        F.size(F.array_distinct(bigrams)).alias("_ndb"),
    )
    return (
        arr.join(top, "doc_id", "left_outer")
        .select(
            "doc_id", "n_tokens",
            F.round(F.when(F.col("n_tokens") > 0,
                           F.col("_nd").cast("double") / F.col("n_tokens"))
                    .otherwise(F.lit(0.0)), 6).alias("distinct_ratio"),
            F.round(F.when(F.col("n_tokens") > 0,
                           F.coalesce(F.col("_top"), F.lit(0)).cast("double")
                           / F.col("n_tokens"))
                    .otherwise(F.lit(0.0)), 6).alias("top_tok_ratio"),
            F.round(F.when(F.col("_nb") > 0,
                           F.lit(1.0) - F.col("_ndb").cast("double") / F.col("_nb"))
                    .otherwise(F.lit(0.0)), 6).alias("dup_bigram_ratio"),
        )
    )


def quality_filter(
    docs: DataFrame,
    min_words: int = 12,
    max_words: int = 100000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_distinct_ratio: float = 0.3,
    max_top_tok_ratio: float = 0.3,
) -> DataFrame:
    """Composite pre-training keep/drop verdict (Gopher/C4-style rule
    stack) — the operator a data pipeline actually runs, with the
    individual signals (``quality_score``, ``repetition_stats``) kept as
    diagnostics.  Per document: per-rule boolean flags plus the AND'd
    ``keep`` verdict, so downstream can both filter and report *why*
    documents died.

    Rules (all engine-exact: integer token counts, ratios compared as
    exact rational inequalities where possible):
      * ``ok_n_words``     — token count in [min_words, max_words]
      * ``ok_word_len``    — mean word length in [min_mean_word_len,
        max_mean_word_len]; compared as n_chars_in_words vs bound·n_words
        (no float division on the comparison path)
      * ``ok_distinct``    — |distinct| / |tokens| ≥ min_distinct_ratio
      * ``ok_repetition`` — top-token frequency / |tokens| ≤ max_top_tok_ratio

    Plan: one explode + two partial-aggregated groupBys for the mode
    frequency (shared shape with ``repetition_stats``); everything else is
    array-local projection.  One O(docs) shuffle total.
    """
    base = docs.select("doc_id", tokens_col().alias("toks"))
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("_c"))
        .groupBy("doc_id").agg(F.max("_c").alias("_top"))
    )
    n = F.col("n_words")
    arr = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.aggregate(F.col("toks"), F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t)).alias("_wchars"),
        F.size(F.array_distinct("toks")).cast("long").alias("_nd"),
    )
    flags = (
        arr.join(top, "doc_id", "left_outer")
        .select(
            "doc_id", "n_words",
            ((n >= min_words) & (n <= max_words)).alias("ok_n_words"),
            F.when(n > 0,
                   (F.col("_wchars") >= F.lit(min_mean_word_len) * n)
                   & (F.col("_wchars") <= F.lit(max_mean_word_len) * n))
            .otherwise(F.lit(False)).alias("ok_word_len"),
            F.when(n > 0, F.col("_nd") >= F.lit(min_distinct_ratio) * n)
            .otherwise(F.lit(False)).alias("ok_distinct"),
            F.when(n > 0,
                   F.coalesce(F.col("_top"), F.lit(0))
                   <= F.lit(max_top_tok_ratio) * n)
            .otherwise(F.lit(False)).alias("ok_repetition"),
        )
    )
    return flags.withColumn(
        "keep",
        F.col("ok_n_words") & F.col("ok_word_len")
        & F.col("ok_distinct") & F.col("ok_repetition"),
    )


def vocab_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary heavy hitters: the k most frequent tokens with
    total occurrences and document frequency — the table that drives
    stop-token lists, ``df_cap`` choices for the dedup family, and
    tokenizer-vocabulary sanity checks.

    Plan: one explode → ONE groupBy(token) computing count and distinct-doc
    count (map-side partials; uniform string keys), then a distributed
    TakeOrdered cut (orderBy + limit k — no global window, merged on the
    driver only at k rows).  Ties broken by token for engine-identical
    output.
    """
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return counts.orderBy(F.desc("n_occurrences"), F.asc("tok")).limit(k)


def bigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """Corpus-statistics language-model scoring — the CCNet/perplexity
    quality gate shape, self-trained on the corpus itself: per document,
    the mean bigram log-probability

        score = mean over bigrams (w1 w2) of ln( count(w1 w2) / count(w1·) )

    where the counts are corpus-wide MLE estimates (every doc bigram exists
    in the corpus by construction, so no smoothing is needed for the score
    to be defined; boilerplate-heavy repeated text scores high, rare noisy
    juxtapositions score low — threshold either tail).

    Plan: the bigram relation is built array-locally (same expression as
    ``repetition_stats``), counted with ONE uniform-key groupBy each for
    bigrams and prefix unigrams (map-side partials), then joined back to
    the per-doc bigram relation on the bigram key and averaged per doc —
    three O(total tokens) shuffles, all on hash-uniform string keys, no
    windows, no collect.  ln is IEEE double in both Spark and DuckDB, and
    the mean is SUM/COUNT rounded 1e-6 (the BM25 precedent).
    """
    base = docs.select("doc_id", tokens_col().alias("toks"))
    bigrams = F.expr(
        "CASE WHEN size(toks) < 2 THEN array()"
        " ELSE transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END")
    db = base.select("doc_id", F.explode(bigrams).alias("bg")).cache()
    counts = db.groupBy("bg").agg(F.count("*").alias("_cbg"))
    prefix = (
        db.select(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1").agg(F.count("*").alias("_cw1"))
    )
    scored = (
        db.join(counts, "bg")
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(prefix, "w1")
        .select("doc_id",
                F.log(F.col("_cbg").cast("double") / F.col("_cw1")).alias("_lp"))
    )
    out = (
        base.select("doc_id", F.size(bigrams).cast("long").alias("n_bigrams"))
        .join(scored.groupBy("doc_id").agg(
            F.sum("_lp").alias("_s"), F.count("*").alias("_n")), "doc_id", "left")
        .select(
            "doc_id", "n_bigrams",
            F.round(F.when(F.col("n_bigrams") > 0, F.col("_s") / F.col("_n"))
                    .otherwise(F.lit(0.0)), 6).alias("mean_logprob"),
        )
    )
    return out


# PII patterns — deliberately conservative regex syntax that means the same
# thing in Java regex (Spark), RE2 (DuckDB), and Python re, so the scrub is
# engine-replayable.  Redaction order: email, then IPv4, then phone.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{7,15}"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII detection + redaction for training-data hygiene: per document,
    match counts for emails / IPv4 addresses / plus-prefixed phone numbers
    and the md5 of the redacted text (matches replaced by ``<EMAIL>`` /
    ``<IP>`` / ``<PHONE>`` in that order).  Pure regexp projections —
    whole-stage codegen, no Python in the hot path; the md5 keeps the
    output row narrow so the scan's text column prunes immediately after
    the projection."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4, "<IP>"),
        PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: minimum md5 over token bigrams (winnowing-style
    min-hash over rolling shingles; single-token docs fall back to the token).

    posexplode + lead() keeps everything JVM-side; the per-doc min is a
    partial-aggregated groupBy.
    """
    toks = docs.select("doc_id", F.posexplode(tokens_col()).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.withColumn("nxt", F.lead("tok").over(w))
    shingle = F.when(F.col("nxt").isNotNull(),
                     F.md5(F.concat(F.col("tok"), F.lit(" "), F.col("nxt"))))
    return (
        bigrams.select("doc_id", shingle.alias("h"), F.md5(F.col("tok")).alias("h1"))
        .groupBy("doc_id")
        .agg(F.coalesce(F.min("h"), F.min("h1")).alias("fingerprint"))
    )


def bpe_merge_candidates(docs: DataFrame, k: int = 20,
                         text_col: str = "text") -> DataFrame:
    """One BPE training step: count every ADJACENT token pair in the
    corpus and return the top-``k`` merge candidates — the pair a
    byte-pair-encoding vocab builder would fuse next (run iteratively
    with re-tokenization to train a full merge table).

    Returns (tok_a, tok_b, pair_count), the k most frequent ordered
    adjacent pairs; ties broken by (tok_a, tok_b) ascending so the cut is
    a pure function of the corpus.

    Plan: per-row zip of the token array with its own shift — a pure
    map-side explode bounded by the token stream — then one groupBy on
    the pair key (map-side combine collapses each task to its distinct
    local pairs ≤ vocab², tiny) and a distributed TakeOrdered for the
    top-k.  No global sort, no windows.
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
    counts = pairs.groupBy("tok_a", "tok_b").agg(
        F.count("*").cast("long").alias("pair_count"))
    return counts.orderBy(F.col("pair_count").desc(), "tok_a", "tok_b").limit(k)


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram entropy H = −Σ_t p_t·ln p_t over the token
    distribution — the repetitiveness/diversity quality signal (a
    boilerplate page or degenerate generation scores near 0; rich text
    scores near ln(vocab)).  Empty documents are dropped.

    Returns (doc_id, n_tokens, entropy).

    Plan: one groupBy (doc_id, tok) with map-side combine, then one
    groupBy doc_id — both partitioned by the document key; no windows,
    no Python.
    """
    tf = (
        docs.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (-F.sum(F.col("tf") * F.log(F.col("tf")))).alias("_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            # H = ln n − (Σ tf·ln tf)/n, algebraically equal to
            # −Σ p ln p but with ONE divide (better float parity)
            F.round(
                F.log(F.col("n_tokens"))
                + F.col("_s") / F.col("n_tokens"), 6
            ).alias("entropy"),
        )
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Data-mix dashboard: per (lang, source) document/token totals and
    each cell's share of the corpus token budget — what a pre-training
    mixture designer looks at before setting ``rebalance_sources``
    fractions.

    Returns (lang, source, n_docs, n_tokens, token_share) with
    token_share = n_tokens / Σ n_tokens (exact integers, one division,
    6dp).

    Plan: one groupBy on the (lang, source) pair with map-side combine
    (the cell count is tiny), one 1-row total broadcast back.
    """
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens_col())).cast("long").alias("n_tokens"),
    )
    tot = cells.agg(F.sum("n_tokens").alias("_t"))
    return cells.join(F.broadcast(tot)).select(
        "lang", "source", "n_docs", "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("_t").cast("double"),
                6).alias("token_share"),
    )


def quality_by_source(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) keep-rate report of the ``quality_filter`` rule
    stack — the table a pipeline operator reads to see WHERE the corpus
    is dying (a source with a collapsing keep-rate is usually a scraper
    regression, not a content change).

    Returns (lang, source, n_docs, n_keep, keep_rate).

    Plan: the quality_filter plan (one explode + two partial aggs) joined
    back to the (lang, source) attributes on doc_id, then one tiny
    groupBy on the cell key.
    """
    flags = quality_filter(docs).select("doc_id", "keep")
    return (
        docs.select("doc_id", "lang", "source")
        .join(flags, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
        )
        .withColumn(
            "keep_rate",
            F.round(F.col("n_keep").cast("double")
                    / F.col("n_docs").cast("double"), 6),
        )
    )


def pmi_topk(docs: DataFrame, k: int = 50, min_count: int = 5) -> DataFrame:
    """Top-k adjacent-token pairs by pointwise mutual information —
    collocation mining over the corpus (the phrase-detection primitive of
    word2vec-style pipelines):

        pmi(w1 w2) = ln( count(w1 w2) · N / (count(w1 ·) · count(· w2)) )

    with N = total bigram positions and positional unigram counts (w1 as
    a left word, w2 as a right word), so every probability is over the
    same bigram-position sample space and the measure is exactly MLE PMI.

    Plan: the same array-local bigram relation as bigram_logprob_scores,
    ONE groupBy on the bigram key (map-side partials), positional unigram
    counts aggregated FROM the bigram counts (tiny second aggregation over
    distinct bigrams, not the corpus), a 1-row N fold broadcast, and a
    TakeOrdered top-k — no windows, no second corpus pass.  ``min_count``
    is the standard low-frequency sieve (PMI explodes on hapax pairs).
    """
    bigrams = F.expr(
        "CASE WHEN size(toks) < 2 THEN array()"
        " ELSE transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END")
    db = (
        docs.select(tokens_col().alias("toks"))
        .select(F.explode(bigrams).alias("bg"))
    )
    counts = db.groupBy("bg").agg(F.count("*").alias("cbg")).cache()
    left = (
        counts.groupBy(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"))
        .agg(F.sum("cbg").alias("cw1"))
    )
    right = (
        counts.groupBy(F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"))
        .agg(F.sum("cbg").alias("cw2"))
    )
    total = counts.agg(F.sum("cbg").alias("n_total"))
    return (
        counts.filter(F.col("cbg") >= min_count)
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
        .join(left, "w1").join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bg", F.col("cbg").cast("long").alias("n_pair"),
            F.round(F.log(F.col("cbg").cast("double") * F.col("n_total")
                          / (F.col("cw1") * F.col("cw2"))), 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bg"))
        .limit(k)
    )


def bpe_train(
    docs: DataFrame,
    merges: int = 12,
    max_word_types: int = 200_000,
    text_col: str = "text",
) -> DataFrame:
    """Full byte-pair-encoding merge-table training (Sennrich et al. 2016)
    — learn the top-``merges`` merge rules from character level up, the
    canonical tokenizer-training pipeline stage.

    Classic BPE trains on the WORD-TYPE histogram, not the token stream:
    the corpus collapses to (word, freq) in one groupBy, after which every
    iteration's cost is independent of corpus size — the 100 TB property.
    ``max_word_types`` caps the histogram (freq desc, word asc — the
    standard head-of-Zipf cut) so the loop state is bounded even on
    open vocabularies.

    Each word is held as delimiter-wrapped symbols ``|h||e||l||l||o|``;
    a merge of (a, b) is the plain string replace ``|a||b|`` -> ``|ab|``,
    whose left-to-right non-overlapping semantics are exactly BPE's greedy
    merge order and are identical in every engine (the DuckDB oracle
    unrolls the same ``merges`` steps).  Pair counts weight each ADJACENT
    symbol pair by word freq (overlaps counted, as in the reference
    algorithm); the winner is (count desc, left asc, right asc) — a pure
    function of the corpus.  Words containing the delimiter are dropped
    (precondition: '|' not in the alphabet).

    Per iteration: one vocab-sized explode + groupBy (map-side combine)
    and a 1-row TakeOrdered — no windows, no global sort; the vocab
    relation is localCheckpointed every few steps to pin the loop plan.

    Returns (step long, left string, right string, pair_count long),
    ``merges`` rows in learned order.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .filter(~F.col("word").contains("|"))
        .groupBy("word").agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(max_word_types)
    )
    enc = F.concat(
        F.lit("|"),
        F.array_join(F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
                     "||"),
        F.lit("|"),
    )
    vocab = words.select(enc.alias("w"), "freq").localCheckpoint(eager=True)

    out_rows = []
    for step in range(1, merges + 1):
        syms = F.split(F.expr("trim(BOTH '|' FROM w)"), r"\|\|")
        n = F.size(syms)
        pairs = (
            vocab.select(
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                        F.slice(syms, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        out_rows.append((step, a, b, c))
        new_vocab = vocab.select(
            F.replace(F.col("w"), F.lit(f"|{a}||{b}|"),
                      F.lit(f"|{a}{b}|")).alias("w"),
            "freq",
        )
        if step % 4 == 0 or step == merges:
            new_vocab = new_vocab.localCheckpoint(eager=True)
        vocab = new_vocab
    return spark.createDataFrame(
        out_rows, "step long, left string, right string, pair_count long")


def bpe_encode(
    docs: DataFrame,
    merges: int = 12,
    max_word_types: int = 200_000,
    text_col: str = "text",
) -> DataFrame:
    """Train a BPE merge table (:func:`bpe_train`) and APPLY it to the
    corpus — the tokenizer-application half of the pipeline: every word
    is character-split, the learned merges are replayed in order, and the
    per-document symbol counts report the achieved compression.

    Returns (doc_id, n_tokens, n_bpe, ratio) for every document with at
    least one token: n_tokens = whitespace tokens, n_bpe = total BPE
    symbols after the merges, ratio = round(n_bpe / n_tokens, 6) (mean
    symbols per word; 1.0 would mean every word became one symbol).
    Words containing the delimiter '|' (excluded from training) fall back
    to their character count.

    Scale shape: encoding happens on the WORD-TYPE relation (distinct
    words — vocabulary-sized, corpus-size-independent, same argument as
    training), as one nested chain of ``merges`` string replaces in a
    single JVM projection; the only corpus-sized exchanges are the
    (doc_id, word) count groupBy and the word-keyed join back.  The
    merge table itself is ``merges`` rows collected once (the bounded
    driver collect the loop-control precedent allows).
    """
    table = bpe_train(docs, merges=merges, max_word_types=max_word_types,
                      text_col=text_col).collect()
    dw = (
        docs.select("doc_id", F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    )
    wt = dw.select("word").distinct()
    enc = F.concat(
        F.lit("|"),
        F.array_join(F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
                     "||"),
        F.lit("|"))
    for r in table:
        a, b = r["left"], r["right"]
        enc = F.replace(enc, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    n_syms = F.when(
        F.col("word").contains("|"), F.length("word").cast("long")
    ).otherwise(F.size(F.split(F.expr("trim(BOTH '|' FROM _enc)"),
                               r"\|\|")).cast("long"))
    encoded = wt.select("word", enc.alias("_enc")).select(
        "word", n_syms.alias("_ns"))
    return (
        dw.join(encoded, "word")
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_tokens"),
             F.sum(F.col("c") * F.col("_ns")).cast("long").alias("n_bpe"))
        .select("doc_id", "n_tokens", "n_bpe",
                F.round(F.col("n_bpe").cast("double") / F.col("n_tokens"), 6)
                .alias("ratio"))
    )
