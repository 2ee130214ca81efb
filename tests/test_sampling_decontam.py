"""Decontamination, OOV rate, per-key caps, and stratified hash sampling."""

import pytest

import polars_net_spark as pl
from polars_net_spark.frame import LazyFrame
from polars_net_spark.llm import (
    cap_per_key,
    contamination_frame,
    oov_rate_frame,
    sample_stratified_hash,
)
from pyspark.sql import functions as F


def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),        # exact benchmark copy
        (2, "totally unrelated words about spark engines here"),
        (3, "alpha beta gamma delta other tail content words"),  # partial overlap
        (4, "xy"),                                          # shorter than n=3 words
    ]
    return pl.from_records(rows, ["doc_id", "text"])


def test_contamination_exact_copy_flagged(spark):
    d = corpus(spark).lazy()
    bench = LazyFrame(d._sdf.filter(F.col("doc_id") == 0))
    out = contamination_frame(d, bench, n=3, threshold=0.5).collect()
    got = {r[0]: (r[1], r[2], r[3], r[4]) for r in out.rows()}
    assert len(got) == 5  # total over the corpus, including the short doc
    # benchmark member and its exact copy: all 4 trigrams matched
    assert got[0] == (4, 4, 1.0, 1)
    assert got[1] == (4, 4, 1.0, 1)
    # disjoint doc: zero matches
    assert got[2][1] == 0 and got[2][3] == 0
    # partial overlap: 'alpha beta gamma'+'beta gamma delta' of 6 trigrams
    assert got[3] == (6, 2, 0.333333, 0)
    # sub-n doc: zeros, not dropped
    assert got[4] == (0, 0, 0.0, 0)


def test_contamination_threshold_applies_to_rounded(spark):
    d = corpus(spark).lazy()
    bench = LazyFrame(d._sdf.filter(F.col("doc_id") == 0))
    out = contamination_frame(d, bench, n=3, threshold=0.333333).collect()
    got = {r[0]: r[4] for r in out.rows()}
    assert got[3] == 1  # rounded 0.333333 >= 0.333333


def test_oov_rate(spark):
    rows = [
        (0, "aa aa aa bb"),
        (1, "aa cc"),
        (2, ""),
    ]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    # vocab_size=1 -> vocabulary = {'aa'} (highest count)
    out = oov_rate_frame(d, vocab_size=1).collect()
    got = {r[0]: (r[1], r[2], r[3]) for r in out.rows()}
    assert got[0] == (4, 1, 0.25)
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (0, 0, 0.0)


def test_oov_vocab_tie_break_deterministic(spark):
    # 'aa' and 'bb' tie on count; word-asc tie-break must pick 'aa'
    d = pl.from_records([(0, "aa bb"), (1, "bb aa")], ["doc_id", "text"]).lazy()
    out = oov_rate_frame(d, vocab_size=1).collect()
    assert all(r[2] == 1 for r in out.rows())  # 'bb' is OOV in both docs


def cap_input(spark):
    rows = [
        (i, f"src{i % 3}", (i * 37) % 101) for i in range(60)
    ]
    return pl.from_records(rows, ["doc_id", "source", "n_chars"]).lazy()


def test_cap_per_key_basic(spark):
    out = cap_per_key(
        cap_input(spark), "source", 5, order_by="n_chars", tie_col="doc_id"
    ).collect()
    rows = out.rows()
    assert len(rows) == 15
    by_src = {}
    for doc_id, src, n_chars in rows:
        by_src.setdefault(src, []).append(n_chars)
    # each source keeps exactly its 5 largest n_chars values
    full = {}
    for doc_id, src, n_chars in cap_input(spark).collect().rows():
        full.setdefault(src, []).append(n_chars)
    for src, kept in by_src.items():
        assert sorted(kept, reverse=True) == sorted(full[src], reverse=True)[:5]


def test_cap_per_key_salted_identical(spark):
    plain = sorted(
        cap_per_key(
            cap_input(spark), "source", 5, order_by="n_chars", tie_col="doc_id"
        ).collect().rows()
    )
    for s in (2, 7, 32):
        salted = sorted(
            cap_per_key(
                cap_input(spark),
                "source",
                5,
                order_by="n_chars",
                tie_col="doc_id",
                salt_buckets=s,
            ).collect().rows()
        )
        assert salted == plain


def test_cap_per_key_ascending(spark):
    out = cap_per_key(
        cap_input(spark), "source", 2, order_by="n_chars", tie_col="doc_id",
        descending=False,
    ).collect()
    for src in ("src0", "src1", "src2"):
        kept = sorted(r[2] for r in out.rows() if r[1] == src)
        full = sorted(
            r[2] for r in cap_input(spark).collect().rows() if r[1] == src
        )
        assert kept == full[:2]


def strat_input(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    return pl.from_records(rows, ["doc_id", "lang"]).lazy()


def test_stratified_sample_deterministic_and_bounded(spark):
    d = strat_input(spark)
    a = sorted(
        sample_stratified_hash(
            d, "doc_id", "lang", {"en": 0.5, "de": 0.2}, default_fraction=0.0
        ).collect().rows()
    )
    b = sorted(
        sample_stratified_hash(
            d, "doc_id", "lang", {"en": 0.5, "de": 0.2}, default_fraction=0.0
        ).collect().rows()
    )
    assert a == b  # pure function of (salt, key, stratum)
    langs = {lang for _, lang in a}
    assert "fr" not in langs  # default fraction 0 removes unlisted strata
    n_en = sum(1 for _, l in a if l == "en")
    n_de = sum(1 for _, l in a if l == "de")
    assert 0 < n_de < n_en  # rates ordered as configured
    # sample is a subset and membership is stable under corpus growth
    half = LazyFrame(d._sdf.filter(F.col("doc_id") < 150))
    c = sorted(
        sample_stratified_hash(
            half, "doc_id", "lang", {"en": 0.5, "de": 0.2}, default_fraction=0.0
        ).collect().rows()
    )
    assert c == [r for r in a if r[0] < 150]


def test_stratified_sample_salt_changes_membership(spark):
    d = strat_input(spark)
    a = sorted(
        sample_stratified_hash(d, "doc_id", "lang", {"en": 0.5}, salt="s1")
        .collect().rows()
    )
    b = sorted(
        sample_stratified_hash(d, "doc_id", "lang", {"en": 0.5}, salt="s2")
        .collect().rows()
    )
    assert a != b


def test_stratified_sample_invalid_fraction(spark):
    with pytest.raises(ValueError):
        sample_stratified_hash(strat_input(spark), "doc_id", "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        sample_stratified_hash(
            strat_input(spark), "doc_id", "lang", {}, default_fraction=-0.1
        )


def test_cap_invalid_n(spark):
    with pytest.raises(ValueError):
        cap_per_key(cap_input(spark), "source", 0, order_by="n_chars", tie_col="doc_id")


def test_contamination_no_cartesian_and_broadcast(spark):
    d = corpus(spark).lazy()
    bench = LazyFrame(d._sdf.filter(F.col("doc_id") == 0))
    plan = contamination_frame(d, bench, n=3)._sdf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def mix_input(spark):
    # source A: 10 docs x 100 units; source B: 10 docs x 100 units; C: 5 x 100
    rows = []
    for i in range(10):
        rows.append((i, "A", 100))
    for i in range(10, 20):
        rows.append((i, "B", 100))
    for i in range(20, 25):
        rows.append((i, "C", 100))
    return pl.from_records(rows, ["doc_id", "source", "sz"]).lazy()


def test_mixture_plan_fractions_exact(spark):
    from polars_net_spark.llm import mixture_plan

    # weights 0.8/0.2 over equal masses: A binds (1000/0.8 < 1000/0.2),
    # so frac_A = 1.0 and frac_B = (1000/0.8)*0.2/1000 = 0.25
    out = mixture_plan(
        mix_input(spark), "source", {"A": 0.8, "B": 0.2}, size_col="sz"
    ).collect()
    got = {r[0]: (r[1], r[2], r[3]) for r in out.rows()}
    assert got["A"] == (0.8, 1000, 1.0)
    assert got["B"] == (0.2, 1000, 0.25)
    assert "C" not in got  # zero weight -> dropped


def test_mixture_sample_membership(spark):
    from polars_net_spark.llm import mixture_sample
    from polars_net_spark.llm.splits import hash_bucket

    d = mix_input(spark)
    out = mixture_sample(
        d, "doc_id", "source", {"A": 0.8, "B": 0.2}, size_col="sz"
    ).collect()
    rows = sorted(out.rows())
    srcs = {r[1] for r in rows}
    assert "C" not in srcs
    # binding source taken whole
    assert sum(1 for r in rows if r[1] == "A") == 10
    # B members are exactly the rows whose md5 bucket < 2500
    expected_b = {
        r[0]
        for r in d._sdf.withColumn("bk", hash_bucket(F.col("doc_id"))).collect()
        if r["source"] == "B" and r["bk"] < 2500
    }
    assert {r[0] for r in rows if r[1] == "B"} == expected_b
    # deterministic: identical on re-run
    again = sorted(
        mixture_sample(
            d, "doc_id", "source", {"A": 0.8, "B": 0.2}, size_col="sz"
        ).collect().rows()
    )
    assert again == rows


def test_mixture_sample_row_count_mode_and_validation(spark):
    from polars_net_spark.llm import mixture_plan, mixture_sample

    # size_col=None weighs by row count: A has 10 rows, C has 5;
    # weights 0.5/0.5 -> C binds, frac_C = 1.0, frac_A = (5/0.5)*0.5/10 = 0.5
    out = mixture_plan(
        mix_input(spark), "source", {"A": 0.5, "C": 0.5}
    ).collect()
    got = {r[0]: r[3] for r in out.rows()}
    assert got["C"] == 1.0 and got["A"] == 0.5
    with pytest.raises(ValueError):
        mixture_sample(mix_input(spark), "doc_id", "source", {})
    with pytest.raises(ValueError):
        mixture_sample(mix_input(spark), "doc_id", "source", {"A": -1.0})


def test_mixture_sample_lazy_build_no_jobs(spark):
    from polars_net_spark.llm import mixture_sample

    sc = spark.sparkContext
    d = mix_input(spark)
    sc.setJobGroup("mix_probe", "mix_probe")
    try:
        _ = mixture_sample(d, "doc_id", "source", {"A": 0.5, "B": 0.5}, size_col="sz")
        jobs = sc.statusTracker().getJobIdsForGroup("mix_probe")
        assert list(jobs) == [], f"eager jobs ran during lazy build: {jobs}"
    finally:
        sc.setJobGroup(None, None)


def test_unigram_logprob(spark):
    import math

    from polars_net_spark.llm import unigram_logprob_frame

    rows = [
        (0, "aa aa aa"),
        (1, "aa bb"),
        (2, ""),
    ]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    # N=5; vocab_size=1 -> {'aa': 4}; p(aa)=4/5, p(bb)=1/5 (floor 1/N)
    out = unigram_logprob_frame(d, vocab_size=1).collect()
    got = {r[0]: (r[1], r[2]) for r in out.rows()}
    assert got[0] == (3, round(math.log10(4 / 5), 6))
    assert got[1] == (2, round((math.log10(4 / 5) + math.log10(1 / 5)) / 2, 6))
    assert got[2] == (0, 0.0)
    # common-token docs score higher than rare-token docs
    assert got[0][1] > got[1][1]


def test_unigram_logprob_invalid(spark):
    from polars_net_spark.llm import unigram_logprob_frame

    with pytest.raises(ValueError):
        unigram_logprob_frame(corpus(spark).lazy(), vocab_size=0)


def test_dedup_lines_keep_first(spark):
    from polars_net_spark.llm import dedup_lines

    rows = [
        (0, "Home | About\nreal content zero\nCookie notice"),
        (1, "Home | About\nunique text one\ncookie notice   "),
        (2, "real content zero\nfresh paragraph two"),
        (3, ""),
    ]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    out = {r[0]: (r[1], r[2], r[3]) for r in dedup_lines(d).collect().rows()}
    # first doc keeps everything
    assert out[0] == ("Home | About\nreal content zero\nCookie notice", 3, 3)
    # dup header dropped; banner dropped case/whitespace-insensitively,
    # surviving text keeps original bytes
    assert out[1] == ("unique text one", 3, 1)
    # line first seen in doc 0 dropped here
    assert out[2] == ("fresh paragraph two", 2, 1)
    # empty doc still present
    assert out[3][2] <= 1


def test_dedup_lines_no_normalize(spark):
    from polars_net_spark.llm import dedup_lines

    rows = [(0, "A\nB"), (1, "a\nB")]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    out = {r[0]: r[1] for r in dedup_lines(d, normalize=False).collect().rows()}
    assert out[1] == "a"  # 'a' != 'A' without normalization; 'B' is a dup


def test_dedup_lines_window_group_limit_plan(spark):
    from polars_net_spark.llm import dedup_lines

    d = pl.from_records([(0, "x\ny")], ["doc_id", "text"]).lazy()
    plan = dedup_lines(d)._sdf._jdf.queryExecution().executedPlan().toString()
    # keep-first must prune losers map-side: a billion-repeat boilerplate
    # line ships <=1 candidate per map task, not a hot reducer partition
    assert "WindowGroupLimit" in plan and ", Partial" in plan


def test_cap_per_key_null_priority_loses(spark):
    rows = [(0, "s", None), (1, "s", 5), (2, "s", 1), (3, "s", None)]
    d = pl.from_records(rows, ["doc_id", "source", "pri"]).lazy()
    # descending: nulls last -> 5, 1 win
    top = cap_per_key(d, "source", 2, order_by="pri", tie_col="doc_id")
    assert sorted(r[0] for r in top.collect().rows()) == [1, 2]
    # ascending: nulls must STILL lose -> 1, 5 win
    bot = cap_per_key(
        d, "source", 2, order_by="pri", tie_col="doc_id", descending=False
    )
    assert sorted(r[0] for r in bot.collect().rows()) == [1, 2]


def test_null_text_totality(spark):
    """NULL-text docs must appear in every per-doc frame (review finding)."""
    from polars_net_spark.llm import oov_rate_frame, unigram_logprob_frame, dedup_lines

    rows = [(0, "aa bb"), (1, None), (2, "")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    oov = {r["doc_id"]: (r["n_words"], r["oov_frac"]) for r in oov_rate_frame(d)._sdf.collect()}
    assert oov[1] == (0, 0.0) and oov[2] == (0, 0.0) and len(oov) == 3
    lp = {r["doc_id"]: r["n_words"] for r in unigram_logprob_frame(d, vocab_size=1)._sdf.collect()}
    assert lp[1] == 0 and len(lp) == 3
    dl = {r["doc_id"]: (r["n_lines"], r["n_kept"]) for r in dedup_lines(d)._sdf.collect()}
    assert dl[1] is not None and dl[1][0] == 1 and len(dl) == 3  # no NULL n_lines


def test_dedup_lines_literal_separator(spark):
    from polars_net_spark.llm import dedup_lines

    rows = [(0, "a|b|c"), (1, "x|b|y")]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    out = {r[0]: r[1] for r in dedup_lines(d, sep="|").collect().rows()}
    # '|' must split into 3 real segments (not per-character regex alternation)
    assert out[0] == "a|b|c"
    assert out[1] == "x|y"  # 'b' first seen in doc 0
    with pytest.raises(ValueError):
        dedup_lines(d, sep="\\E")


def test_mixture_sample_missing_source_yields_empty(spark):
    from polars_net_spark.llm import mixture_plan, mixture_sample

    d = mix_input(spark)
    out = mixture_sample(d, "doc_id", "source", {"A": 0.5, "TYPO": 0.5}, size_col="sz")
    assert out.collect().height == 0  # surfaces loudly, never a silent 100/0 mix
    plan = {r[0]: (r[2], r[3]) for r in
            mixture_plan(d, "source", {"A": 0.5, "TYPO": 0.5}, size_col="sz").collect().rows()}
    assert plan["TYPO"] == (0, 0.0)  # the culprit is visible in the plan


def test_hash_threshold_rounding_half_up(spark):
    from polars_net_spark.llm.sampling import _half_up

    # 0.00125 * 10000 = 12.5: banker's round() gives 12, SQL round gives 13
    assert _half_up(0.00125 * 10000) == 13
    assert _half_up(12.4) == 12


class TestTokenBudgetCap:
    def test_whole_doc_semantics(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import cap_tokens_per_key

        rows = [
            ("a", 1, 5.0, 40), ("a", 2, 4.0, 50), ("a", 3, 3.0, 30),
            ("b", 4, 9.0, 200),
        ]
        df = pl.from_records(rows, ["src", "doc_id", "prio", "toks"])
        out = cap_tokens_per_key(
            df, key_col="src", token_col="toks", budget=100,
            order_by="prio", tie_col="doc_id",
        ).spark.collect()
        kept = {r["doc_id"]: r["cum_tokens"] for r in out}
        # a: 40 (cum 40), 50 (cum 90), 30 would hit 120 > 100 -> dropped whole
        assert kept == {1: 40, 2: 90}

    def test_null_priority_trims_first_and_null_tokens_zero(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import cap_tokens_per_key

        sdf = spark.createDataFrame(
            [("a", 1, 5.0, 60), ("a", 2, None, 60), ("a", 3, 1.0, None)],
            "src string, doc_id long, prio double, toks int",
        )
        out = cap_tokens_per_key(
            pl.LazyFrame(sdf), key_col="src", token_col="toks", budget=60,
            order_by="prio", tie_col="doc_id",
        ).spark.collect()
        kept = sorted(r["doc_id"] for r in out)
        # order: prio 5 (60) -> prio 1/null-toks (+0) -> null prio (drop at 120)
        assert kept == [1, 3]

    def test_bad_budget(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import cap_tokens_per_key
        import pytest as _pt

        df = pl.from_records([("a", 1, 1.0, 1)], ["src", "doc_id", "prio", "toks"])
        with _pt.raises(ValueError):
            cap_tokens_per_key(df, "src", "toks", -1, "prio", "doc_id")


class TestOversampleByWeight:
    def test_copy_counts_and_determinism(self, spark):
        from polars_net_spark.llm import oversample_by_weight
        from polars_net_spark.llm.splits import hash_bucket, _BUCKETS
        from pyspark.sql import functions as F

        rows = [(i, float(w)) for i, w in enumerate([0.0, 1.0, 2.0, 2.5, 0.5])]
        d = spark.createDataFrame(rows, ["k", "w"])
        out = oversample_by_weight(d, key_col="k", weight="w", salt="s").collect().rows()
        counts = {}
        for k, w, idx in out:
            counts[k] = counts.get(k, 0) + 1
        assert counts.get(0) is None          # weight 0 drops
        assert counts[1] == 1 and counts[2] == 2
        # fractional part decided by the md5 bucket — recompute the draw
        draws = {
            r[0]: r[1]
            for r in d.select(
                "k", (hash_bucket(F.col("k"), salt="s") < 0.5 * _BUCKETS).cast("int")
            ).collect()
        }
        assert counts[3] == 2 + draws[3]
        assert counts.get(4, 0) == draws[4]
        # copy index is 1..n
        idxs = sorted(i for k, w, i in out if k == 2)
        assert idxs == [1, 2]
        # deterministic across runs
        out2 = oversample_by_weight(d, key_col="k", weight="w", salt="s").collect().rows()
        assert sorted(out) == sorted(out2)

    def test_expected_mass(self, spark):
        from polars_net_spark.llm import oversample_by_weight
        from pyspark.sql import functions as F

        d = spark.range(0, 2000).select(F.col("id").alias("k"), F.lit(1.3).alias("w"))
        n = oversample_by_weight(d, key_col="k", weight="w").spark.count()
        assert abs(n - 2600) < 150  # ~1.3x mass, hash-exact not RNG


class TestNegativeSampling:
    def test_no_positive_and_deterministic(self, spark):
        from polars_net_spark.llm import negative_sample_pairs
        from pyspark.sql import functions as F

        corpus = spark.range(0, 200).select(F.col("id").alias("doc_id"))
        queries = spark.range(0, 20).select(
            F.col("id").alias("query_id"), F.col("id").alias("pos_id")
        )
        out = negative_sample_pairs(
            queries, corpus, k=3, num_buckets=16, salt="t"
        ).collect().rows()
        assert 0 < len(out) <= 60
        for qid, j, neg in out:
            assert neg != qid          # positive excluded
            assert 1 <= j <= 3
        # at most one pick per (query, draw)
        keys = [(q, j) for q, j, _ in out]
        assert len(keys) == len(set(keys))
        out2 = negative_sample_pairs(
            queries, corpus, k=3, num_buckets=16, salt="t"
        ).collect().rows()
        assert sorted(out) == sorted(out2)

    def test_salt_changes_draws(self, spark):
        from polars_net_spark.llm import negative_sample_pairs
        from pyspark.sql import functions as F

        corpus = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        queries = spark.range(0, 30).select(
            F.col("id").alias("query_id"), F.col("id").alias("pos_id")
        )
        a = sorted(negative_sample_pairs(queries, corpus, k=2, num_buckets=32, salt="a").collect().rows())
        b = sorted(negative_sample_pairs(queries, corpus, k=2, num_buckets=32, salt="b").collect().rows())
        assert a != b


class TestLengthBucketBatches:
    def test_batch_invariants(self, spark):
        from collections import Counter

        from polars_net_spark.llm import length_bucket_batches
        from pyspark.sql import functions as F

        d = spark.range(0, 300).select(
            F.col("id").alias("doc_id"), (F.col("id") * 7 % 1000).alias("tok")
        )
        out = length_bucket_batches(
            d, token_col="tok", id_col="doc_id", batch_size=8,
            edges=[200, 400, 800], num_shards=4, salt="s",
        ).collect().rows()
        assert len(out) == 300
        # batch key = (bucket, shard, batch_idx); all full except trailing per key
        sizes = Counter((b, s, bi) for _, _, b, s, bi, _ in out)
        per_shard = Counter((b, s) for _, _, b, s, _, _ in out)
        for (b, s, bi), n in sizes.items():
            last_idx = (per_shard[(b, s)] - 1) // 8
            assert n == 8 or (bi == last_idx and n == per_shard[(b, s)] % 8)
        # bucket consistent with edges
        for _, tok, b, _, _, _ in out:
            assert b == sum(tok >= e for e in (200, 400, 800))
        # positions are 0..n-1 within each batch
        poss = {}
        for row in out:
            poss.setdefault(tuple(row[2:5]), []).append(row[5])
        out2 = length_bucket_batches(
            d, token_col="tok", id_col="doc_id", batch_size=8,
            edges=[200, 400, 800], num_shards=4, salt="s",
        ).collect().rows()
        assert sorted(out) == sorted(out2)
