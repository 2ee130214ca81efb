"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All are pure Column expressions (JVM-side, whole-stage-codegen'd) — no Python
in the hot path, so they run at scan speed over 100 TB.  Every function takes
and returns Columns so they compose with any frame.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .._cache import register_cache

__all__ = [
    "token_count",
    "quality_score",
    "language_id",
    "content_fingerprint",
    "shingle_fingerprints",
    "text_metrics_frame",
    "shingle_fingerprint_frame",
    "url_normalize",
    "url_host",
    "url_registrable_domain",
    "url_metrics_frame",
    "corpus_stats_frame",
    "corpus_divergence",
    "filter_by_domains",
    "split_sentences_frame",
    "readability_frame",
    "STOPWORDS_EN",
]

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
]

# Marker words per language for the n-gram/stopword language heuristic.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _stage_words(sdf, text_col: str, id_col: str, lower: bool = False):
    """Persist (id, text, words) so downstream metrics share ONE split.

    Catalyst does not CSE a complex array expression referenced by several
    output columns/lambdas — each reference recomputes it (measured ~7x on
    the shingle path).  A persisted staging projection is the reliable fix.
    Also rebalances single-file inputs.
    """
    par = sdf.sparkSession.sparkContext.defaultParallelism
    text = F.col(text_col)
    if lower:
        text = F.lower(text)
    return register_cache(
        sdf.select(F.col(id_col), F.col(text_col), _words(text).alias("__ws__")).repartition(par)
    )


def _token_count_expr(text: Column, words: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(words))


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank string → 0."""
    return _token_count_expr(text, _words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper-bound token count: split on word boundaries AND digits/
    punctuation runs (a regex proxy for byte-pair segmentation)."""
    pieces = F.split(text, r"(?<=\W)|(?=\W)|(?<=\d)(?=\D)|(?<=\D)(?=\d)")
    return F.size(F.filter(pieces, lambda p: F.length(F.trim(p)) > 0))


def quality_score(text: Column, round_to: int = 6) -> Column:
    """Heuristic document quality in [0,1]: combines length band, punctuation
    ratio, stopword ratio, and mean word length — the classic cheap pre-filters
    for LLM corpus cleaning.  Deterministic, expressible in ANSI SQL."""
    return _quality_expr(text, _words(text), round_to)


def _quality_expr(text: Column, words: Column, round_to: int) -> Column:
    n = F.length(text).cast("double")
    n_words = F.size(words).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", "")).cast("double")
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(STOPWORDS_EN))
    ).cast("double")
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_words > 0, (n - (n_words - 1)) / n_words).otherwise(F.lit(0.0))
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    word_len_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_score = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    score = (length_score + word_len_score + punct_score + stop_score) / 4.0
    return F.round(score, round_to)


def language_id(text: Column) -> Column:
    """Stopword-marker language heuristic: count per-language marker-word hits,
    argmax with deterministic tie-break (first language in the table order).
    Pure expressions — at 100 TB this is a scan, not a UDF."""
    return _langid_expr(_words(text))


def _langid_expr(words: Column) -> Column:
    lowered = F.transform(words, F.lower)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        hits = F.size(F.filter(lowered, lambda w: w.isin(markers)))
        scores.append((lang, hits))
    # argmax via chained when (deterministic order)
    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang, hits in scores:
        is_better = hits > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, hits).otherwise(best_score)
    return best_lang


def text_metrics_frame(
    frame, text_col: str = "text", id_col: str = "doc_id", round_to: int = 6
):
    """All text metrics in one staged pass: token count, quality, language,
    fingerprint share ONE persisted words split instead of each recomputing it
    (Catalyst doesn't CSE the split across output columns — measured ~4x)."""
    from ..frame import LazyFrame

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    staged = _stage_words(sdf, text_col, id_col)
    text = F.col(text_col)
    ws = F.col("__ws__")
    out = staged.select(
        F.col(id_col),
        _token_count_expr(text, ws).cast("long").alias("n_tokens"),
        _quality_expr(text, ws, round_to).alias("quality"),
        _langid_expr(ws).alias("lang_pred"),
    )
    return LazyFrame(out)


def shingle_fingerprint_frame(
    frame, text_col: str = "text", id_col: str = "doc_id", k: int = 3, keep_every: int = 4
):
    """Fingerprint summary per doc (fp, n_kept, min/max shingle hash), staged
    twice: words behind one persist (the shingle expression references the
    split several times internally), then the winnowed hash set behind a
    second so the three derived columns don't recompute it."""
    from ..frame import LazyFrame

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    par = sdf.sparkSession.sparkContext.defaultParallelism
    staged_words = _stage_words(sdf, text_col, id_col, lower=True)
    staged = register_cache(
        staged_words.select(
            F.col(id_col),
            content_fingerprint(F.col(text_col)).alias("fp"),
            _shingle_fp_expr(F.col("__ws__"), k, keep_every).alias("__fps__"),
        ).repartition(par)
    )
    fps = F.col("__fps__")
    out = staged.select(
        F.col(id_col),
        F.col("fp"),
        F.size(fps).cast("long").alias("n_kept"),
        F.get(fps, 0).alias("min_fp"),
        F.get(fps, F.size(fps) - 1).alias("max_fp"),
    )
    return LazyFrame(out)


def content_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text (lowercase,
    collapsed whitespace).  md5 is identical across engines → oracle-checkable."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def shingle_fingerprints(text: Column, k: int = 3, keep_every: int = 4) -> Column:
    """Rolling fingerprint set: md5 of each word k-shingle, keeping a winnowed
    deterministic subset — hashes whose first hex digit falls in the first
    16/keep_every digits (a 1/keep_every sampler that any engine can compute:
    it's just a prefix test on the hex string).  Output: sorted array of kept
    shingle hashes for containment / near-dup detection at the corpus level."""
    return _shingle_fp_expr(_words(F.lower(text)), k, keep_every)


def _shingle_fp_expr(words: Column, k: int, keep_every: int) -> Column:
    if 16 % keep_every != 0:
        raise ValueError("keep_every must divide 16")
    keep_chars = "0123456789abcdef"[: 16 // keep_every]
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " ")
    )
    shingles = F.when(n >= k, shingles).otherwise(F.array())
    hashes = F.transform(shingles, F.md5)
    kept = F.filter(hashes, lambda h: F.substring(h, 1, 1).isin(list(keep_chars)))
    return F.array_sort(F.array_distinct(kept))


def clean_text(
    text: Column,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    nfc: bool = False,
) -> Column:
    """Corpus text hygiene: strip C0/DEL control characters, collapse runs
    of whitespace to single spaces and trim.  Pure regexp Column ops —
    map-only at any scale.  ``nfc=True`` additionally applies Unicode NFC
    normalization through an Arrow-batched pandas_udf (no JVM builtin
    exists; this is the documented slow path — keep it off the 100 TB hot
    path unless the corpus actually mixes compositions)."""
    c = text
    if strip_control:
        # C0 controls MINUS \t \n \r — line/word whitespace must survive
        # to the collapse step, or words merge across line breaks.
        c = F.regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    if collapse_whitespace:
        c = F.regexp_replace(F.trim(c), "\\s+", " ")
    if nfc:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _nfc(s):
            import unicodedata

            return s.map(lambda v: unicodedata.normalize("NFC", v) if v is not None else None)

        c = _nfc(c)
    return c


def clean_text_frame(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
    **kwargs,
):
    """Frame wrapper for :func:`clean_text`: (id, n_chars_before/after,
    cleaned text)."""
    from ..frame import LazyFrame

    sdf = frame.spark if hasattr(frame, "spark") else frame
    cleaned = clean_text(F.col(text_col), **kwargs)
    out = sdf.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars_before"),
        F.length(cleaned).cast("long").alias("n_chars_after"),
        cleaned.alias(out_col),
    )
    return LazyFrame(out)


# -- URL curation (corpus-level dedup/filter keys) ---------------------------
#
# Web-scraped training corpora dedup and filter on canonical URLs and
# domains (C4/RefinedWeb-style: strip tracking params, lowercase the host,
# blocklist by registrable domain).  Everything here is a regexp_replace /
# parse-free Column chain — map-only at any scale.

_TRACKING_PARAMS = r"(?:utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src|igshid)"

# common two-level public suffixes: registrable domain keeps THREE labels
_TWO_LEVEL_TLDS = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.nz", "co.kr", "com.br", "com.mx",
    "com.cn", "com.tw", "co.in", "co.za",
]


def url_normalize(url: Column) -> Column:
    """Canonical URL for exact dedup: drop the #fragment, lowercase
    scheme://host (path/query case preserved), strip default :80/:443
    ports, remove tracking query params (utm_*, fbclid, gclid, ...), squash
    the leftover ?&& debris, and drop a trailing slash.  Six
    regexp_replace passes, one scan, no UDF."""
    c = F.regexp_replace(url, r"#.*$", "")
    # lowercase the scheme://host[:port] prefix only
    head = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    c = F.when(head == "", c).otherwise(F.concat(F.lower(head), rest))
    c = F.regexp_replace(c, r"^(https?://[^/?#:]*):(?:80|443)(?=[/?#]|$)", r"$1")
    c = F.regexp_replace(c, r"([?&])" + _TRACKING_PARAMS + r"=[^&#]*", r"$1")
    c = F.regexp_replace(c, r"&&+", "&")           # param debris
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"/$", "")
    return c


def url_host(url: Column) -> Column:
    """Host part (lowercased, port stripped) — the domain filter key."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1))


def url_registrable_domain(url: Column) -> Column:
    """eTLD+1-ish registrable domain: the last two host labels, or three
    when the suffix is a common two-level public suffix (co.uk, com.au, ...).
    A heuristic list, not the full PSL — swap in the PSL as a broadcast map
    for production crawls; the shape (pure Column regex) stays the same."""
    h = url_host(url)
    two = "|".join(t.replace(".", r"\.") for t in _TWO_LEVEL_TLDS)
    three_label = F.regexp_extract(h, r"([^.]+\.(?:" + two + r"))$", 1)
    two_label = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(three_label != "", three_label).otherwise(two_label)


def url_metrics_frame(
    frame,
    url_col: str = "url",
    id_col: str = "doc_id",
):
    """Frame wrapper: (id, canonical url, host, registrable domain, and a
    dedup-ready md5 of the canonical url)."""
    from ..frame import LazyFrame

    sdf = frame.spark if hasattr(frame, "spark") else frame
    u = F.col(url_col)
    canon = url_normalize(u)
    return LazyFrame(
        sdf.select(
            F.col(id_col),
            canon.alias("url_canonical"),
            url_host(u).alias("host"),
            url_registrable_domain(u).alias("domain"),
            F.md5(canon).alias("url_key"),
        )
    )


def corpus_stats_frame(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: "str | None" = None,
    exact_percentiles: bool = True,
):
    """One-call corpus health report, per source (or one 'all' row): doc
    count, token totals/mean, exact (or sketch) p50/p90 token counts, empty
    and ASCII-pure fractions.  The pre-flight numbers a pipeline run logs
    before burning 100 TB of compute.

    One scan + one tiny groupBy; ``exact_percentiles=False`` switches to
    percentile_approx (constant memory — at corpus scale the exact
    percentile's per-group buffer is the usual OOM suspect, same contract
    as describe/winsorize)."""
    from ..frame import LazyFrame

    sdf = frame._sdf if hasattr(frame, "_sdf") else frame
    words = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    n_tok = F.size(words)
    staged = sdf.select(
        (F.col(source_col) if source_col else F.lit("all")).alias("source"),
        n_tok.alias("__nt__"),
        (n_tok == 0).cast("int").alias("__empty__"),
        F.col(text_col).rlike(r"^[\x00-\x7F]*$").cast("int").alias("__ascii__"),
    )
    if exact_percentiles:
        pct = F.percentile(F.col("__nt__"), F.array(F.lit(0.5), F.lit(0.9)))
    else:
        pct = F.percentile_approx(F.col("__nt__"), F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000))
    out = staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt__").cast("long").alias("total_tokens"),
        F.round(F.avg("__nt__"), 6).alias("mean_tokens"),
        pct.alias("__p__"),
        F.round(F.avg("__empty__"), 6).alias("empty_frac"),
        F.round(F.avg("__ascii__"), 6).alias("ascii_frac"),
    ).select(
        "source", "n_docs", "total_tokens", "mean_tokens",
        F.round(F.get("__p__", 0), 6).alias("p50_tokens"),
        F.round(F.get("__p__", 1), 6).alias("p90_tokens"),
        "empty_frac", "ascii_frac",
    )
    return LazyFrame(out)


def filter_by_domains(
    frame,
    url_col: str = "url",
    allow: "Sequence[str] | None" = None,
    block: "Sequence[str] | None" = None,
):
    """Domain-level corpus filtering (the robots/licensing/blocklist pass):
    keep rows whose registrable domain is in ``allow`` (when given) and not
    in ``block``.  Domain extraction is the map-only
    :func:`url_registrable_domain`; list membership is an isin literal for
    small lists — for a million-domain blocklist join a broadcast frame on
    the ``domain`` column instead (same extraction, one broadcast hash
    join)."""
    from ..frame import LazyFrame

    if allow is None and block is None:
        raise ValueError("give allow= and/or block=")
    sdf = frame._sdf if hasattr(frame, "_sdf") else frame
    dom = url_registrable_domain(F.col(url_col))
    cond = F.lit(True)
    if allow is not None:
        cond = cond & dom.isin([d.lower() for d in allow])
    if block is not None:
        cond = cond & ~dom.isin([d.lower() for d in block])
    return LazyFrame(sdf.filter(cond))


def split_sentences_frame(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
):
    """(id, sent_idx, sentence): regex sentence segmentation — maximal runs
    of non-terminator characters plus their trailing ``.!?`` punctuation,
    trimmed, empties dropped.  The pattern uses no lookaround, so it is
    portable to RE2-based engines (the DuckDB oracle runs the same regex).

    Map-only (regexp_extract_all + posexplode, zero shuffles); sentence
    indexes are 0-based document order.  This is deliberately the cheap
    JVM-side segmenter — abbreviation-aware splitting would need a Python
    stage; compose with clean_text first for whitespace hygiene.
    """
    from pyspark.sql import DataFrame as _SDF

    from ..frame import LazyFrame

    sdf = frame if isinstance(frame, _SDF) else frame.spark
    sents = F.expr(
        f"regexp_extract_all({text_col}, '[^.!?]+[.!?]*', 0)"
    )
    trimmed = F.transform(sents, lambda s: F.trim(s))
    kept = F.filter(trimmed, lambda s: F.length(s) >= min_chars)
    out = sdf.select(
        F.col(id_col), F.posexplode(kept).alias("sent_idx", "sentence")
    )
    return LazyFrame(out)


def corpus_divergence(
    frame_a,
    frame_b,
    text_col: str = "text",
    round_to: int = 6,
) -> "LazyFrame":
    """Jensen–Shannon divergence (base-2 bits, 0 = identical, 1 = disjoint)
    between the unigram term distributions of two corpora — the drift /
    contamination-shift probe a pipeline runs between a new crawl batch and
    the training mix, or between train and eval splits.  Output is ONE row:
    ``js_divergence``, vocab sizes, shared-vocab count, and token totals.

    JS is used (not raw KL) because corpora always have disjoint tail terms
    and KL(P‖Q) is infinite the moment Q misses one of P's terms; JS mixes
    through M = (P+Q)/2, which is finite and symmetric by construction —
    no smoothing constant to tune.

    Scale shape: each side is one explode + one (term) count aggregate
    (map-side combining), then a full-outer join of the two term tables and
    one final one-row aggregate — all keyed shuffles on the term, bounded
    by vocabulary size, never an all-pairs structure.
    """
    from ..frame import LazyFrame

    def _term_counts(frame, side):
        from pyspark.sql import DataFrame as SparkDF
        sdf = frame if isinstance(frame, SparkDF) else frame.spark
        words = F.filter(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
            lambda w: F.length(w) > 0,
        )
        return (
            sdf.select(F.explode(words).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )

    ta, tb = _term_counts(frame_a, "a"), _term_counts(frame_b, "b")
    joined = ta.join(tb, "term", "full").select(
        "term",
        F.coalesce("c_a", F.lit(0)).alias("ca"),
        F.coalesce("c_b", F.lit(0)).alias("cb"),
    )
    tot = joined.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("vocab_all"),
        F.sum(F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0)).alias("vocab_shared"),
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).alias("vocab_a"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).alias("vocab_b"),
    )
    w = joined.join(F.broadcast(tot))
    p = F.col("ca") / F.col("na")
    q = F.col("cb") / F.col("nb")
    m = (p + q) / 2.0
    # 0·log(0/m) = 0: guard each side on its own count
    contrib = (
        F.when(F.col("ca") > 0, 0.5 * p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, 0.5 * q * F.log2(q / m)).otherwise(F.lit(0.0))
    )
    out = (
        w.groupBy("na", "nb", "vocab_a", "vocab_b", "vocab_shared")
        .agg(F.sum(contrib).alias("js"))
        .select(
            F.round("js", round_to).alias("js_divergence"),
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("vocab_shared").cast("long").alias("vocab_shared"),
            F.col("na").cast("long").alias("tokens_a"),
            F.col("nb").cast("long").alias("tokens_b"),
        )
    )
    return LazyFrame(out)


def readability_frame(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
):
    """Classic readability scores per document — Flesch reading ease and
    Flesch–Kincaid grade level — from three Column-math counts: whitespace
    words, sentence terminators ([.!?]+ runs, floored at 1), and a
    vowel-group syllable heuristic ([aeiouy]+ runs per word, floored at 1
    per word).  A standard corpus-quality feature (filter beside the Gopher
    rules; readability drifting down across crawl snapshots is a quality
    regression).

    Pure JVM Column expressions (split / regexp_extract_all / aggregate) —
    zero shuffles, zero Python, scan-speed over any corpus size.  Empty/null
    documents yield null scores.  Output: id, n_words, n_sentences,
    n_syllables, flesch_reading_ease, fk_grade."""
    from ..frame import LazyFrame
    from pyspark.sql import DataFrame as SparkDF

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    t = F.col(text_col)
    words = F.filter(_words(t), lambda w: F.length(w) > 0)
    nw = F.size(words)
    ns = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0))), F.lit(1)
    )
    syl = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ),
    )
    staged = sdf.select(
        F.col(id_col).alias("id"),
        nw.alias("n_words"),
        ns.alias("n_sentences"),
        syl.alias("n_syllables"),
    )
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    ok = F.col("n_words") > 0
    out = staged.select(
        "id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.when(ok, 206.835 - 1.015 * wps - 84.6 * spw), round_to
        ).alias("flesch_reading_ease"),
        F.round(
            F.when(ok, 0.39 * wps + 11.8 * spw - 15.59), round_to
        ).alias("fk_grade"),
    )
    return LazyFrame(out)


def zipf_fit(
    frame,
    text_col: str = "text",
    lower: bool = True,
    min_count: int = 1,
    round_to: int = 6,
) -> "LazyFrame":
    """Zipf's-law fit of the corpus term-frequency distribution: OLS of
    ln(count) on ln(rank) over the vocabulary (rank 1 = most frequent).
    A healthy natural-language corpus slopes ≈ −1; templated or
    deduplicate-me corpora flatten (repeated boilerplate inflates the
    head) and OCR-noise corpora steepen the tail — a one-row corpus
    health probe to sit beside word entropy and JS divergence.

    Ranks are GLOBAL over the vocabulary and ride the distsort
    range-bucket + driver-prefix machinery (desc on count; ties share a
    bucket and break deterministically by term within it) — no
    single-partition window however large the vocabulary.  One explode +
    count aggregate, the rank pass, then one fused 1-row OLS reduce.

    Output (1 row): n_terms, slope, intercept, r2."""
    from ..frame import LazyFrame
    from ..operators.distsort import with_bucket_offsets
    from pyspark.sql import Window

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    text = F.col(text_col)
    if lower:
        text = F.lower(text)
    counts = (
        sdf.select(F.explode(_words(text)).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= int(min_count))
    )
    counts = register_cache(counts)
    offs, gb, tot = with_bucket_offsets(counts, "cnt", {"r": F.lit(1)}, desc=True)
    w = Window.partitionBy(gb).orderBy(F.col("cnt").desc(), F.col("term").asc())
    rank = F.col("__off_r__") + F.row_number().over(w)
    pts = offs.select(
        F.log(rank).alias("__x__"), F.log(F.col("cnt").cast("double")).alias("__y__")
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__x__").alias("mx"),
        F.avg("__y__").alias("my"),
        F.covar_pop("__x__", "__y__").alias("cxy"),
        F.var_pop("__x__").alias("vx"),
        F.var_pop("__y__").alias("vy"),
    )
    slope = F.when(F.col("vx") > 0, F.col("cxy") / F.col("vx"))
    r2 = F.when(
        (F.col("vx") > 0) & (F.col("vy") > 0),
        (F.col("cxy") * F.col("cxy")) / (F.col("vx") * F.col("vy")),
    )
    out = agg.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, round_to).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )
    return LazyFrame(out)


__all__.append("zipf_fit")


def heaps_law(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_points: int = 8,
    round_to: int = 6,
):
    """Heaps'-law fit V(T) ≈ k·T^β — vocabulary growth vs tokens seen, the
    corpus-health curve behind "is more data still adding new words?"
    (β ≈ 0.4-0.6 for natural text; β near 0 means the source is looping,
    near 1 means it's noise/ids).

    Scale shape: each word contributes ONE (word, first_doc_id) row (a
    map-side-combining min aggregate — the cumulative-distinct trick:
    V(t) = #{words : first_id ≤ t}), per-doc token counts are map-only,
    and both evaluate against an ``n_points`` literal id grid in two
    fused conditional reduces; the log-log OLS runs on the driver over
    the n_points-bounded table.  ``id_col`` defines the corpus order and
    MUST be numeric / timestamp / date: the grid thresholds compare ids
    NUMERICALLY, so a string doc id has no order-preserving numeric form
    here — rank or cast it first (a monotone ingest sequence or event
    time is the intended axis).
    Output (1 row): n_points, n_docs_axis... see columns: heaps_k,
    heaps_beta, r2, vocab_final, tokens_final."""
    import math

    from pyspark.sql import DataFrame as SparkDF

    from ..frame import LazyFrame

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    if n_points < 2:
        raise ValueError("n_points must be >= 2")
    id_dt = dict(sdf.dtypes).get(id_col, "")
    if not (
        id_dt.startswith("timestamp")
        or id_dt == "date"
        or id_dt in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or id_dt.startswith("decimal")
    ):
        raise TypeError(
            f"heaps_law: id_col {id_col!r} has dtype {id_dt or '?'}; the "
            "corpus-order grid compares ids numerically, so id_col must be "
            "numeric / timestamp / date (rank or cast a string id first)"
        )
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: F.length(w) > 0
    )
    if id_dt.startswith("timestamp") or id_dt == "date":
        idc = F.unix_micros(F.col(id_col).cast("timestamp")).cast("double")
    else:
        idc = F.col(id_col).cast("double")
    base = sdf.filter(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
    posed = base.select(idc.alias("__id__"), F.explode(words).alias("__w__"))
    firsts = posed.groupBy("__w__").agg(F.min("__id__").alias("__first__"))
    toks = base.select(
        idc.alias("__id__"), F.size(words).alias("__ntok__")
    )
    lo_hi = toks.agg(
        F.min("__id__").alias("lo"), F.max("__id__").alias("hi")
    ).first()
    if lo_hi is None or lo_hi["lo"] is None:
        raise ValueError("heaps_law: empty corpus")
    lo, hi = float(lo_hi["lo"]), float(lo_hi["hi"])
    P = int(n_points)
    grid = [lo + (hi - lo) * (k + 1) / P for k in range(P)]
    vrow = firsts.agg(
        *[
            F.count(F.when(F.col("__first__") <= t, 1)).alias(f"v{i}")
            for i, t in enumerate(grid)
        ]
    ).first()
    trow = toks.agg(
        *[
            F.sum(F.when(F.col("__id__") <= t, F.col("__ntok__"))).alias(f"t{i}")
            for i, t in enumerate(grid)
        ]
    ).first()
    pts = [
        (float(trow[f"t{i}"] or 0), float(vrow[f"v{i}"] or 0))
        for i in range(P)
    ]
    pts = [(t, v) for t, v in pts if t > 0 and v > 0]
    if len(pts) < 2:
        raise ValueError("heaps_law: fewer than 2 usable grid points")
    xs = [math.log(t) for t, _ in pts]
    ys = [math.log(v) for _, v in pts]
    m = len(xs)
    mx, my = sum(xs) / m, sum(ys) / m
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    syy = sum((y - my) ** 2 for y in ys)
    beta = sxy / sxx if sxx > 0 else 0.0
    k_coef = math.exp(my - beta * mx)
    r2 = (sxy * sxy) / (sxx * syy) if sxx > 0 and syy > 0 else 1.0
    spark = sdf.sparkSession
    out = spark.createDataFrame(
        [
            (
                m,
                round(k_coef, round_to),
                round(beta, round_to),
                round(r2, round_to),
                int(pts[-1][1]),
                int(pts[-1][0]),
            )
        ],
        "n_points int, heaps_k double, heaps_beta double, r2 double, "
        "vocab_final bigint, tokens_final bigint",
    )
    return LazyFrame(out)


__all__.append("heaps_law")


def ngram_coverage(
    train,
    test,
    text_col: str = "text",
    n: int = 2,
    round_to: int = 6,
):
    """How much of a TEST corpus's n-gram inventory a TRAIN corpus already
    contains — the decontamination/QA companion to the q160-family
    dedup ops (high coverage of an eval set means leakage; low unigram
    coverage of new data means the tokenizer/vocab will fragment it).

    Reports both views: type coverage (share of DISTINCT test n-grams
    present in train) and token coverage (share of test n-gram
    OCCURRENCES whose gram is present — the mass-weighted number).

    Scale shape: each side collapses to its distinct-gram inventory
    map-side (train's carries no counts at all); one gram-keyed LEFT join
    marks presence; one fused reduce.  Never all-pairs, never a
    broadcast hint — AQE broadcasts the smaller inventory when it fits.
    Output (1 row): n_test_types, n_covered_types, type_coverage,
    n_test_tokens, token_coverage."""
    from pyspark.sql import DataFrame as SparkDF

    from ..frame import LazyFrame

    if n < 1:
        raise ValueError("n must be >= 1")
    tr = train if isinstance(train, SparkDF) else train.spark
    te = test if isinstance(test, SparkDF) else test.spark

    def grams(sdf):
        # stage the word array as a real column, then fold shifted slices
        # with zip_with: element_at-per-index inside a transform() lambda
        # defeats subexpression elimination (the split re-evaluates per
        # element -> O(words^2) regex work per doc; measured 11x slower)
        ws = F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda w: F.length(w) > 0,
        )
        staged = sdf.filter(F.col(text_col).isNotNull()).select(
            ws.alias("__ws__")
        )
        w = F.col("__ws__")
        if n == 1:
            g = w
        else:
            ln = F.greatest(F.size(w) - (n - 1), F.lit(0))
            g = F.slice(w, 1, ln)
            for j in range(1, n):
                g = F.zip_with(
                    g, F.slice(w, 1 + j, ln),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
        return staged.select(F.explode(g).alias("__g__"))

    train_types = grams(tr).distinct().withColumn("__in__", F.lit(1))
    test_counts = grams(te).groupBy("__g__").agg(F.count(F.lit(1)).alias("__c__"))
    joined = test_counts.join(train_types, "__g__", "left")
    red = joined.agg(
        F.count(F.lit(1)).alias("types"),
        F.count(F.when(F.col("__in__").isNotNull(), 1)).alias("cov_types"),
        F.sum("__c__").alias("toks"),
        F.sum(F.when(F.col("__in__").isNotNull(), F.col("__c__")).otherwise(0)).alias(
            "cov_toks"
        ),
    )
    out = red.select(
        F.col("types").cast("long").alias("n_test_types"),
        F.col("cov_types").cast("long").alias("n_covered_types"),
        F.round(F.col("cov_types") / F.col("types"), round_to).alias("type_coverage"),
        F.col("toks").cast("long").alias("n_test_tokens"),
        F.round(F.col("cov_toks") / F.col("toks"), round_to).alias("token_coverage"),
    )
    return LazyFrame(out)


__all__.append("ngram_coverage")


def fertility_report(
    frame,
    text_col: str = "text",
    by: "str | None" = None,
    round_to: int = 6,
):
    """Tokenizer-fertility panel — the "how many subword tokens does this
    corpus cost per word" planning number that decides context-window
    budgets and flags scripts/sources a vocabulary fragments badly
    (fertility ≈ 1.2-1.4 is healthy English; ≫2 means the tokenizer will
    shred it).  Tokens here are the deterministic GPT-style pre-split
    — letter runs | single digits | single punctuation marks
    (``[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]``) — chosen over bpe_ish_token_count
    because RE2 (DuckDB) cannot replay lookarounds, and this one is
    engine-portable so the gate can value-verify it.

    Per segment (``by=None`` = whole corpus): n_docs, n_words (whitespace),
    n_tokens, fertility = tokens/words, chars_per_token.  ONE map-side-
    combining aggregate; no join, no window, no Python."""
    from pyspark.sql import DataFrame as SparkDF

    from ..frame import LazyFrame

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    keys = [by] if by is not None else []
    text = F.col(text_col)
    words = F.size(
        F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)
    )
    toks = F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
    )
    chars = F.length(text)
    base = sdf.filter(text.isNotNull())
    g = base.groupBy(*keys) if keys else base.groupBy()
    red = g.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(words).alias("w"),
        F.sum(toks).alias("t"),
        F.sum(chars).alias("c"),
    )
    out = red.select(
        *keys,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("w").cast("long").alias("n_words"),
        F.col("t").cast("long").alias("n_tokens"),
        F.round(
            F.when(F.col("w") > 0, F.col("t") / F.col("w")), round_to
        ).alias("fertility"),
        F.round(
            F.when(F.col("t") > 0, F.col("c") / F.col("t")), round_to
        ).alias("chars_per_token"),
    )
    return LazyFrame(out)


__all__.append("fertility_report")


def strip_markup_frame(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
):
    """HTML/XML markup removal — the C4/web-crawl pre-step this family was
    missing: drops <script>/<style> blocks WITH their contents, strips
    remaining tags and comments, decodes the common named entities
    (&amp; &lt; &gt; &quot; &#39; &nbsp;), and collapses the whitespace
    the removals leave behind.  Regexes are RE2-safe (no lookarounds) so
    the DuckDB oracle replays them verbatim.

    Deliberately a TAG STRIPPER, not an HTML5 parser: malformed nesting
    degrades gracefully (unclosed <script> eats to end of doc — the same
    choice C4 makes); use a real parser upstream when DOM fidelity
    matters.  Pure map-side Column math, zero shuffle.  Output: input
    columns + out_col + n_tags (markup elements removed)."""
    from pyspark.sql import DataFrame as SparkDF

    from ..frame import LazyFrame

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tags = F.size(F.regexp_extract_all(t, F.lit(r"<[^>]*>"), 0))
    # script/style blocks go first (contents too), then comments, then tags
    s = F.regexp_replace(t, r"(?is)<script[^>]*>.*?(</script>|$)", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?(</style>|$)", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?(-->|$)", " ")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    # &amp; decodes LAST: decoding it first would turn '&amp;lt;' into
    # '&lt;' and then into a literal '<' — double-unescaping that can
    # reintroduce tag-like text the strip pass above can no longer see
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    out = sdf.withColumn(out_col, s).withColumn(
        "n_tags", n_tags.cast("long")
    )
    return LazyFrame(out)


# Unicode script blocks as RE2-safe literal ranges — both engines (Java
# regex, RE2) treat these as plain code-point ranges, so the oracle
# replays them byte-for-byte.
_SCRIPT_RANGES: "dict[str, str]" = {
    "latin": "[A-Za-zÀ-ÖØ-öø-ÿĀ-ſ]",
    "cyrillic": "[Ѐ-ӿ]",
    "greek": "[Ͱ-Ͽ]",
    "arabic": "[؀-ۿ]",
    "hebrew": "[֐-׿]",
    "devanagari": "[ऀ-ॿ]",
    "cjk": "[一-鿿぀-ゟ゠-ヿ가-힯]",
    "digit": "[0-9]",
}


def script_detect_frame(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
):
    """Unicode-script composition per document — the triage that catches
    wrong-language/mojibake/spam docs the stopword language_id heuristic
    can't (it only knows its marker words): per-script character SHARES
    (of script-classified chars) and the dominant script with a
    deterministic tie-break (share desc, then name asc).  Docs with no
    script-classified characters get dominant='unknown'.

    One deletion-count regex per script (length minus
    regexp_replace-to-empty length — no match-array allocation), staged
    behind a NARROW cached projection (id + 9 ints) so the share columns
    and the dominant argmax reference each count ONCE: Catalyst's
    project-collapse re-inlines complex expressions into every reference
    (the _stage_words pathology — measured 13.3 s -> ~1 s on this op at
    sf0.1), and every script range is a single-char class so deletion
    counts equal match counts exactly.  RE2-replayable.  Output: (id,
    n_chars, share_<script>..., dominant)."""
    from pyspark.sql import DataFrame as SparkDF

    from ..frame import LazyFrame

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    t = F.coalesce(F.col(text_col), F.lit(""))
    staged = register_cache(
        sdf.select(
            F.col(id_col),
            F.length(t).cast("long").alias("__nch__"),
            *[
                (F.length(t) - F.length(F.regexp_replace(t, rng, "")))
                .cast("long")
                .alias(f"__c_{name}__")
                for name, rng in _SCRIPT_RANGES.items()
            ],
        )
    )
    counts = {name: F.col(f"__c_{name}__") for name in _SCRIPT_RANGES}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    shares = {
        name: F.when(total > 0, F.round(c / total, round_to)).otherwise(
            F.lit(0.0)
        )
        for name, c in counts.items()
    }
    # deterministic argmax: least over (-share, name) structs = share desc,
    # name asc on ties (matches the oracle's name-ascending CASE chain)
    best = F.least(
        *[
            F.struct(
                (-shares[name]).alias("s"),
                F.lit(name).alias("n"),
            )
            for name in sorted(_SCRIPT_RANGES)
        ]
    )
    dominant = F.when(total > 0, best.getField("n")).otherwise(F.lit("unknown"))
    out = staged.select(
        F.col(id_col),
        F.col("__nch__").alias("n_chars"),
        *[shares[name].alias(f"share_{name}") for name in _SCRIPT_RANGES],
        dominant.alias("dominant"),
    )
    return LazyFrame(out)


__all__.extend(["strip_markup_frame", "script_detect_frame"])


def yules_k(
    frame,
    text_col: str = "text",
    round_to: int = 6,
):
    """Yule's K vocabulary-richness characteristic + hapax share — the
    repetitiveness fingerprint that is (unlike type-token ratio) nearly
    length-invariant, so it compares corpora of different sizes honestly
    (K ≈ 50-200 for natural prose; high K = formulaic/boilerplate-heavy,
    the corpus-level signal behind strip_boilerplate_lines):

        K = 10⁴ · (Σ_m m²·V_m − N) / N²

    over the frequency spectrum (V_m = number of word types occurring
    exactly m times, N = total tokens); hapax_share = V_1/V, the "words
    seen once" fraction that heaps_law's growth curve integrates.

    Scale shape: one word-count aggregate, one frequency-of-frequency
    aggregate (key = the COUNT — tiny), one fused reduce: Σ m²V_m needs
    only the spectrum, never a second corpus pass.  Output (1 row):
    yules_k, n_tokens, n_types, hapax_count, hapax_share."""
    from pyspark.sql import DataFrame as SparkDF

    from ..frame import LazyFrame

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    counts = (
        sdf.filter(F.col(text_col).isNotNull())
        .select(F.explode(words).alias("__w__"))
        .groupBy("__w__")
        .agg(F.count(F.lit(1)).alias("__m__"))
    )
    spectrum = counts.groupBy("__m__").agg(F.count(F.lit(1)).alias("__vm__"))
    r = spectrum.agg(
        F.sum(F.col("__m__") * F.col("__vm__")).alias("n"),
        F.sum(F.col("__m__") ** 2 * F.col("__vm__")).alias("m2v"),
        F.sum("__vm__").alias("types"),
        F.sum(F.when(F.col("__m__") == 1, F.col("__vm__"))).alias("hapax"),
    ).collect()[0]
    n = int(r["n"] or 0)
    if n < 2:
        raise ValueError("yules_k: corpus has fewer than 2 tokens")
    m2v, types = float(r["m2v"]), int(r["types"])
    hapax = int(r["hapax"] or 0)
    k = 1e4 * (m2v - n) / (n * n)
    spark = sdf.sparkSession
    out = spark.createDataFrame(
        [(round(k, round_to), n, types, hapax,
          round(hapax / types, round_to))],
        "yules_k double, n_tokens bigint, n_types bigint, "
        "hapax_count bigint, hapax_share double",
    )
    return LazyFrame(out)


__all__.append("yules_k")
