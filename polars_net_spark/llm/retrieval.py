"""Sparse text retrieval over a document corpus: TF-IDF term weighting and
BM25 keyword search.

Beyond-reference scope (the reference engine has no IR layer); formulas are
the textbook ones (sklearn-style smoothed idf for TF-IDF; Robertson/Sparck
Jones idf for BM25) so every score is deterministic and replicable in ANSI
SQL for the DuckDB oracle.

Scale design (100 TB corpus):
- Tokenization + explode are map-side; term frequencies use a hash aggregate
  on (doc_id, term) with partial (map-side) aggregation, so the only full
  shuffle is keyed by (doc_id, term) — no skew beyond natural term skew,
  which the partial aggregate absorbs.
- Corpus-level scalars (N, avgdl) and the per-term document-frequency table
  are tiny aggregates, attached via broadcast joins — they never reshuffle
  the corpus.
- BM25 filters the exploded terms to the query vocabulary BEFORE any
  aggregation, so a k-term query aggregates only matching postings, not the
  whole corpus.
- Final top-k uses orderBy().limit() which Spark executes as
  TakeOrderedAndProject (per-partition heaps + single merge, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["tfidf_top_terms", "bm25_topk", "negative_sample_pairs", "tfidf_cosine_pairs", "rrf_fuse"]


def _tokens(sdf, text_col: str, id_col: str):
    """(id, term) postings: lowercase, whitespace-split, empties dropped."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    words = F.filter(words, lambda w: F.length(w) > 0)
    return sdf.select(F.col(id_col), F.explode(words).alias("term"))


def tfidf_top_terms(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    round_to: int = 6,
):
    """Top-k terms per document by smoothed TF-IDF.

    score = tf * (ln((1 + N) / (1 + df)) + 1), ties broken by term asc.
    Output: (id, term, tf, score, rank) with rank 1..k per document.
    """
    from ..frame import LazyFrame

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    toks = _tokens(sdf, text_col, id_col)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = sdf.agg(F.count("*").alias("__n_docs__"))
    scored = (
        tf.join(F.broadcast(df_tbl), on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("__n_docs__")) / (1.0 + F.col("df"))) + 1.0),
                round_to,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
    return LazyFrame(out)


def bm25_topk(
    frame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
):
    """Top-k documents for a bag-of-words query by BM25.

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

    Output: (id, score, rank), rank 1..k by score desc then id asc.
    round_to defaults to 4 (not 6) because the per-term partial scores are
    summed in shuffle order; 1e-4 is far above double-sum jitter for a
    handful of query terms but keeps the oracle hash stable.
    """
    from ..frame import LazyFrame

    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    words = F.filter(words, lambda w: F.length(w) > 0)
    base = sdf.select(F.col(id_col), words.alias("__ws__"))
    docs = base.select(F.col(id_col), F.size("__ws__").alias("dl"))

    # postings restricted to the query vocabulary before aggregation
    toks = base.select(
        F.col(id_col), F.explode("__ws__").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))

    stats = docs.agg(
        F.count("*").alias("__n_docs__"), F.avg("dl").alias("__avgdl__")
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf.join(docs, on=id_col)
        .join(F.broadcast(df_tbl), on="term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("__n_docs__") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl__"))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(F.round(F.sum("part"), round_to).alias("score"))
    out = (
        agg.orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score"), F.asc(id_col))),
        )
        .select(F.col(id_col), F.col("score"), F.col("rank").cast("long").alias("rank"))
    )
    return LazyFrame(out)


def term_document_frequency(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    round_to: int = 6,
):
    """Corpus vocabulary statistics: per term, document frequency, total
    occurrences, corpus DF fraction and smoothed idf — the statistics pass
    behind stopword discovery, OOV vocabularies and idf tables.

    One explode + two keyed aggregations (term-keyed shuffle); the doc count
    rides in as a 1-row broadcast.  ``min_df`` prunes the hapax tail BEFORE
    the join, which at 100 TB is most of the vocabulary.

    Output: (term, df, total_tf, df_frac, idf) with df >= min_df.
    """
    from ..frame import LazyFrame

    sdf = frame.spark if hasattr(frame, "spark") else frame
    toks = _tokens(sdf, text_col, id_col)
    per_doc = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    stats = per_doc.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    ).filter(F.col("df") >= min_df)
    n_docs = sdf.agg(F.count("*").alias("__n_docs__"))
    out = (
        stats.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("total_tf").cast("long").alias("total_tf"),
            F.round(F.col("df") / F.col("__n_docs__"), round_to).alias("df_frac"),
            F.round(
                F.log((1.0 + F.col("__n_docs__")) / (1.0 + F.col("df"))) + 1.0, round_to
            ).alias("idf"),
        )
    )
    return LazyFrame(out)


def negative_sample_pairs(
    queries,
    corpus,
    query_id: str = "query_id",
    positive_col: str = "pos_id",
    corpus_id: str = "doc_id",
    k: int = 4,
    num_buckets: int = 1024,
    salt: str = "",
):
    """Deterministic in-batch-free negative sampling for contrastive /
    embedding training: for every query row, pick ``k`` pseudo-random corpus
    documents (excluding the query's own positive) with NO RNG — every draw
    is an md5 computation, so the sample is identical across runs, engines,
    and cluster layouts.

    Mechanics: corpus docs land in ``num_buckets`` hash buckets; draw ``j``
    of query ``q`` targets bucket md5(q#j) and takes the bucket member with
    the smallest md5(q#j#doc) (a fresh hash per draw, so repeated draws from
    one query are decorrelated).  A draw whose target bucket is empty or
    holds only the positive emits nothing — size ``num_buckets`` well below
    corpus/10 to make that negligible.

    Scale: ONE equi-join on the bucket key (corpus side shuffles once,
    bucket population ~ corpus/num_buckets rows per key) + one
    map-side-combining min-struct aggregate per (query, draw).  No cartesian,
    no window.  Output: (query_id, draw_idx, neg_id).
    """
    from ..frame import LazyFrame
    from .splits import hash_bucket

    qdf = queries._sdf if isinstance(queries, LazyFrame) else queries
    cdf = corpus._sdf if isinstance(corpus, LazyFrame) else corpus
    bucketed = cdf.select(
        F.col(corpus_id).alias("__neg__"),
        hash_bucket(F.col(corpus_id), salt=salt, num_buckets=num_buckets).alias("__b__"),
    )
    draws = qdf.select(
        F.col(query_id),
        F.col(positive_col).alias("__pos__"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("draw_idx"),
    ).withColumn(
        "__b__",
        hash_bucket(
            F.concat(
                F.col(query_id).cast("string"), F.lit("#"), F.col("draw_idx").cast("string")
            ),
            salt=salt,
            num_buckets=num_buckets,
        ),
    )
    cand = draws.join(bucketed, "__b__").filter(F.col("__neg__") != F.col("__pos__"))
    rank = F.md5(
        F.concat(
            F.lit(salt),
            F.col(query_id).cast("string"),
            F.lit("#"),
            F.col("draw_idx").cast("string"),
            F.lit("#"),
            F.col("__neg__").cast("string"),
        )
    )
    picked = (
        cand.select(query_id, "draw_idx", F.struct(rank.alias("r"), F.col("__neg__").alias("n")).alias("__p__"))
        .groupBy(query_id, "draw_idx")
        .agg(F.min("__p__").alias("best"))
        .select(query_id, "draw_idx", F.col("best.n").alias("neg_id"))
    )
    return LazyFrame(picked)


def tfidf_cosine_pairs(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    max_df_ratio: float = 0.2,
    ngram: int = 1,
    round_to: int = 6,
):
    """Sparse TF-IDF cosine document pairs (id_a < id_b, cosine ≥
    threshold) — the bag-of-words sibling of the dense
    :func:`~.similarity.embedding_threshold_join`.

    ``ngram`` > 1 switches terms to word n-grams — on tiny/templated
    vocabularies unigram spaces are degenerate (every term near-ubiquitous,
    so the df cap either empties the space or admits a df² join); n-grams
    restore df spread.

    Vector space: tf·idf with sklearn's smoothed idf ln((1+N)/(1+df))+1,
    restricted to terms with df ≤ max_df_ratio·N — stop-term removal IS part
    of the semantics (and the scale guard: a term in every doc would create
    a df² postings join).  Norms use the same restricted space, so scores
    are exact cosines of the declared vectors.

    Plan: one postings aggregate (map-side combining), df/N attached by
    broadcast, postings self-join keyed on term (never all-pairs), one
    (a, b)-keyed dot aggregate, norm verify.  All deterministic and
    ANSI-replicable.
    """
    from .._cache import register_cache
    from ..frame import LazyFrame

    from pyspark.sql import DataFrame as _SDF

    sdf = frame if isinstance(frame, _SDF) else frame.spark
    if ngram <= 1:
        toks = _tokens(sdf, text_col, id_col)
    else:
        words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        # zip_with over shifted slices: the words expression evaluates ngram
        # times per row, not once per gram index (element_at inside a
        # transform() lambda defeats CSE -> O(words^2) regex; measured 11x
        # on the same shape in ngram_coverage)
        ln = F.greatest(F.size(words) - (ngram - 1), F.lit(0))
        grams = F.slice(words, 1, ln)
        for _j in range(1, ngram):
            grams = F.zip_with(
                grams, F.slice(words, 1 + _j, ln),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        toks = sdf.filter(F.size(words) >= ngram).select(
            F.col(id_col), F.explode(grams).alias("term")
        )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = sdf.select(F.count_distinct(id_col).alias("__n__"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        df.join(F.broadcast(n_docs))
        .filter(F.col("df") <= F.col("__n__") * F.lit(float(max_df_ratio)))
        .select("term", "df", "__n__")
    )
    idf = F.log((F.lit(1.0) + F.col("__n__")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    weighted = register_cache(
        tf.join(kept, "term").select(
            id_col, "term", (F.col("tf") * idf).alias("w")
        )
    )
    norms = weighted.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    lhs = weighted.select(
        F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa")
    )
    rhs = weighted.select(
        F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        lhs.join(rhs, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("nb"))
    out = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("na") * F.col("nb")), round_to))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return LazyFrame(out)


def rrf_fuse(
    frame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    ranker_col: str = "ranker",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int | None = None,
    round_to: int = 6,
):
    """Reciprocal Rank Fusion over multiple rankers' result lists: input is
    long-format (query, doc, ranker, rank); fused score per (query, doc) =
    Σ_rankers 1/(k + rank) — the standard zero-tuning way to combine BM25 +
    dense ANN + any other retriever into one list (k=60 per the RRF paper;
    larger k flattens the head).  A doc missing from one ranker's list
    simply contributes nothing for that ranker (the practical convention —
    no penalty term, no imputed rank).

    One (query, doc)-keyed map-side-combining aggregate, then a query-keyed
    window for the fused rank — shards on the query key at any scale.
    Ties break by doc id ascending (deterministic).  ``top_n`` keeps the
    best n per query after fusion.  Output: query, doc, rrf_score,
    fused_rank."""
    from pyspark.sql import DataFrame as SparkDF, Window
    from pyspark.sql import functions as F

    from ..frame import LazyFrame

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col).cast("double")
    base = sdf.filter(q.isNotNull() & d.isNotNull() & r.isNotNull())
    fused = base.groupBy(q.alias("query"), d.alias("doc")).agg(
        F.sum(1.0 / (F.lit(float(k)) + r)).alias("__s__"),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("__s__").desc(), F.col("doc").asc()
    )
    out = fused.select(
        "query",
        "doc",
        F.round(F.col("__s__"), round_to).alias("rrf_score"),
        F.row_number().over(w).alias("fused_rank"),
    )
    if top_n is not None:
        out = out.filter(F.col("fused_rank") <= int(top_n))
    return LazyFrame(out)


def pmi_collocations(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    round_to: int = 6,
):
    """Adjacent-bigram collocation mining by pointwise mutual information:
    which word pairs co-occur far more than their unigram frequencies
    predict — the corpus-analysis primitive behind phrase detection
    (``new york``-style merges), tokenizer-vocab seeding and boilerplate
    discovery.

    PMI = ln( p(a,b) / (p(a)·p(b)) ) with every probability over the SAME
    denominator — the corpus token total (the word2phrase/gensim-Phrases
    convention; one shared space keeps p(a,b) ≤ min(p(a), p(b)));
    NPMI = PMI / −ln p(a,b) then normalizes to [−1, 1] so scores are
    comparable across corpus sizes.

    Scale design: bigrams are built map-side per document (two ``slice``s +
    ``zip_with`` on the token array — no positional self-join), so the only
    corpus-sized shuffles are the (a, b) and unigram hash aggregates, both
    map-side combining.  ``min_count`` prunes the pair tail BEFORE the two
    term-keyed joins against the unigram table — at 100 TB the hapax pair
    tail is most of the output, so this is the cost lever.  The two corpus
    totals ride in as a 1-row broadcast.

    Output: (a, b, pair_count, pmi, npmi) with pair_count >= min_count.
    """
    from ..frame import LazyFrame

    sdf = frame.spark if hasattr(frame, "spark") else frame
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    docs = sdf.select(words.alias("__w__")).filter(F.size("__w__") >= 2)
    n = F.size("__w__")
    bigrams = F.zip_with(
        F.slice("__w__", 1, n - 1),
        F.slice("__w__", 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    pairs = docs.select(F.explode(bigrams).alias("bg")).select("bg.a", "bg.b")
    pair_counts = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= int(min_count))
    )
    toks = sdf.select(F.explode(words).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("__c__"))
    totals = toks.agg(F.count(F.lit(1)).alias("__nt__"))
    joined = (
        pair_counts.join(uni.withColumnRenamed("term", "a").withColumnRenamed("__c__", "__ca__"), "a")
        .join(uni.withColumnRenamed("term", "b").withColumnRenamed("__c__", "__cb__"), "b")
        .join(F.broadcast(totals))
    )
    p_ab = F.col("pair_count") / F.col("__nt__")
    p_a = F.col("__ca__") / F.col("__nt__")
    p_b = F.col("__cb__") / F.col("__nt__")
    pmi = F.log(p_ab / (p_a * p_b))
    out = joined.select(
        "a",
        "b",
        F.col("pair_count").cast("long").alias("pair_count"),
        F.round(pmi, round_to).alias("pmi"),
        F.round(pmi / -F.log(p_ab), round_to).alias("npmi"),
    )
    return LazyFrame(out)


__all__.extend(["term_document_frequency", "pmi_collocations"])


# 50 high-frequency English function words; the RAKE phrase-boundary set.
# Kept deliberately small and FROZEN: the oracle SQL embeds the same list.
RAKE_STOPWORDS = (
    "a an and are as at be but by for from has have he her his i in is it "
    "its of on or she that the their them they this to was we were which "
    "will with you your not no so if then than too very can could would"
).split()


def rake_keywords(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    stopwords: "list[str] | None" = None,
    min_words: int = 1,
    max_words: int = 4,
    round_to: int = 6,
):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal runs of non-stopword words between stopword/punctuation
    boundaries; each word scores degree/frequency (degree = Σ |phrase| over
    its phrase occurrences — co-occurrence weight including itself; freq =
    occurrence count), and a phrase scores the sum of its words' scores.
    The phrase-level complement of tfidf_top_terms (which ranks single
    terms): multi-word keyphrases with no corpus statistics needed —
    documents score independently, so the pipeline shards on doc_id alone.

    Boundary splitting is pure regex Column math (RE2-compatible — no
    lookarounds — so the DuckDB oracle replays it exactly): punctuation
    folds to '|', then maximal stopword RUNS fold to '|' in one pass.
    Phrase/word stats are two (doc, word)-keyed map-side-combining
    aggregates; phrases longer than ``max_words`` are dropped (classic RAKE
    noise control).  Output: (id, phrase, n_words, score, rank), top_k per
    document by (score desc, phrase)."""
    from ..frame import LazyFrame

    sdf = frame.spark if hasattr(frame, "spark") else frame
    sw = stopwords if stopwords is not None else RAKE_STOPWORDS
    if not sw:
        raise ValueError("stopwords must be non-empty (RAKE needs boundaries)")
    alt = "|".join(sorted(sw))
    pad = F.concat(F.lit(" "), F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(" "))
    p1 = F.regexp_replace(pad, r"[^a-z0-9\s]+", " | ")
    p2 = F.regexp_replace(p1, r"\s+", " ")
    p3 = F.regexp_replace(p2, f" (?:{alt})(?: (?:{alt}))* ", " | ")
    phrases = F.filter(
        F.transform(F.split(p3, r"\|"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    ph = (
        sdf.select(F.col(id_col), F.explode(phrases).alias("phrase"))
        .withColumn("__w__", F.split("phrase", " "))
        .withColumn("n_words", F.size("__w__"))
        .filter((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words))
    )
    words = ph.select(id_col, "n_words", F.explode("__w__").alias("word"))
    wstats = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("__freq__"),
        F.sum("n_words").alias("__deg__"),
    )
    scored = (
        ph.select(id_col, "phrase", "n_words", F.explode("__w__").alias("word"))
        .join(wstats, [id_col, "word"])
        .groupBy(id_col, "phrase", "n_words")
        .agg(
            F.sum(F.col("__deg__") / F.col("__freq__")).alias("__s__"),
            (F.count(F.lit(1)) / F.col("n_words")).alias("__occ__"),
        )
    )
    # rank on the ROUNDED score: mathematically-equal scores (common in
    # RAKE — small-integer ratio sums) may differ by an ulp across engines
    # depending on addition order; rounding first keeps the (score, phrase)
    # order — and therefore the top_k cut — engine-independent.
    final = scored.withColumn(
        "score", F.round(F.col("__s__") / F.col("__occ__"), round_to)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("phrase"))
    out = (
        final.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select(
            id_col,
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )
    return LazyFrame(out)


__all__.append("rake_keywords")
