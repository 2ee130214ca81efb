"""Quality-heuristic (Gopher-style), PII, TF-IDF and BM25 operators."""

import math

import pytest

import polars_net_spark as pl
from polars_net_spark.llm import (
    bm25_topk,
    gopher_quality_frame,
    pii_metrics_frame,
    repetition_metrics_frame,
    tfidf_top_terms,
)


def qdocs(spark):
    rows = [
        (0, "the cat sat on the mat and that was that with the hat of it"),
        (1, "spark spark spark spark spark spark spark spark spark spark"),
        (2, "- item one\n- item two\n- item three\nplain line..."),
        (3, "x\nx\nx\ny"),
        (4, ""),
        (5, "### #### ##"),
    ]
    return pl.from_records(rows, ["doc_id", "text"]).lazy()


def test_gopher_metrics(spark):
    out = gopher_quality_frame(qdocs(spark), min_words=5, min_stop_hits=2).collect()
    by_id = {r[0]: r for r in out.rows()}
    # doc 0: 15 words; 'the','and','that','with','of' => 5 distinct required stopwords
    assert by_id[0][1] == 15
    assert by_id[0][7] == 5
    assert by_id[0][8] is True
    # doc 1: no stopwords -> fails
    assert by_id[1][7] == 0 and by_id[1][8] is False
    # doc 2: 3 of 4 lines bulleted, 1 of 4 ends with ellipsis
    assert abs(by_id[2][4] - 0.75) < 1e-9
    assert abs(by_id[2][5] - 0.25) < 1e-9
    # doc 4 (empty): 0 words, no crash, fails
    assert by_id[4][1] == 0 and by_id[4][8] is False
    # doc 5: all-symbol words -> alpha_frac 0, symbol ratio high
    assert by_id[5][6] == 0.0
    assert by_id[5][3] > 1.0  # 9 '#'s / 3 words


def test_repetition_metrics(spark):
    out = repetition_metrics_frame(qdocs(spark), ngram=2).collect()
    by_id = {r[0]: r for r in out.rows()}
    # doc 3: lines x,x,x,y -> dup fraction 1 - 2/4
    assert abs(by_id[3][1] - 0.5) < 1e-9
    # doc 1: 'spark spark' 2-gram occurs 9 times in 10 words
    assert by_id[1][2] == "spark spark"
    assert by_id[1][3] == 9
    # chars covered: 9 * len('spark spark')=11 over 59 chars
    assert abs(by_id[1][4] - round(9 * 11 / 59, 6)) < 1e-9
    # doc 4 empty: no grams -> zero row preserved via left join
    assert by_id[4][3] == 0 and by_id[4][4] == 0.0


def test_pii_scrub(spark):
    rows = [
        (0, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567"),
        (1, "server at 192.168.0.1 and 10.0.0.255 no mail"),
        (2, "clean text only"),
    ]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    out = pii_metrics_frame(d).collect()
    by_id = {r[0]: r for r in out.rows()}
    assert by_id[0][1] == 1  # email
    assert by_id[0][2] >= 1  # phone
    assert "<EMAIL>" in by_id[0][4] and "<PHONE>" in by_id[0][4]
    assert by_id[1][3] == 2  # two IPs
    assert "<IP>" in by_id[1][4]
    assert by_id[2][1] == by_id[2][2] == by_id[2][3] == 0
    assert by_id[2][4] == "clean text only"


def test_tfidf_top_terms(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "cherry cherry cherry durian"),
    ]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    out = tfidf_top_terms(d, k=2).collect()
    rows_out = {(r[0], r[4]): (r[1], r[2], r[3]) for r in out.rows()}
    n = 3
    # doc 0 top term: apple tf=2 df=1
    term, tf, score = rows_out[(0, 1)]
    assert term == "apple" and tf == 2
    assert abs(score - round(2 * (math.log((1 + n) / (1 + 1)) + 1), 6)) < 1e-9
    # doc 2 top: cherry tf=3 df=2
    term, tf, score = rows_out[(2, 1)]
    assert term == "cherry" and tf == 3
    assert abs(score - round(3 * (math.log((1 + n) / (1 + 2)) + 1), 6)) < 1e-9
    # ties break alphabetically: doc 1 has banana/cherry both tf=1 df=2
    assert rows_out[(1, 1)][0] == "banana"
    assert rows_out[(1, 2)][0] == "cherry"


def test_bm25_topk(spark):
    rows = [
        (0, "apple banana apple apple"),
        (1, "banana cherry banana"),
        (2, "cherry cherry cherry durian"),
        (3, "unrelated words entirely"),
    ]
    d = pl.from_records(rows, ["doc_id", "text"]).lazy()
    out = bm25_topk(d, ["apple", "banana"], k=3).collect()
    got = [(r[0], r[1], r[2]) for r in out.rows()]
    assert [g[0] for g in got] == [0, 1]  # only docs with a query term; 0 wins
    assert got[0][2] == 1 and got[1][2] == 2
    # hand-compute doc 0: dl=4, avgdl=3.5, N=4; apple tf=3 df=1, banana tf=1 df=2
    k1, b = 1.2, 0.75

    def idf(df):
        return math.log(1 + (4 - df + 0.5) / (df + 0.5))

    def part(tf, df, dl):
        return idf(df) * tf / (tf + k1 * (1 - b + b * dl / 3.5))

    exp0 = round(part(3, 1, 4) + part(1, 2, 4), 4)
    assert abs(got[0][1] - exp0) < 1e-9


def test_bm25_empty_query_raises(spark):
    d = pl.from_records([(0, "a")], ["doc_id", "text"]).lazy()
    try:
        bm25_topk(d, [])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_blocklist_word_boundary_semantics(spark):
    import polars_net_spark as pl
    from polars_net_spark.llm import blocklist_metrics_frame

    rows = [(1, "the Quick brown fox"), (2, "classy words only"), (3, "bad ass content")]
    sdf = pl.get_spark().createDataFrame(rows, "doc_id long, text string")
    out = {r[0]: tuple(r) for r in blocklist_metrics_frame(sdf, ["ass", "quick"]).spark.collect()}
    assert out[1][1] == 1 and out[1][3] is True          # case-insensitive word hit
    assert out[2][1] == 0 and out[2][3] is False          # 'classy' must NOT match 'ass'
    assert out[3][1] == 1
    # substring mode flags 'classy'
    sub = {r[0]: r[1] for r in blocklist_metrics_frame(
        sdf, ["ass"], word_boundary=False).spark.collect()}
    assert sub[2] == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        blocklist_metrics_frame(sdf, [])


class TestLinearQuality:
    def test_score_closed_form(self, spark):
        import math

        import polars_net_spark as pl
        from polars_net_spark.llm import linear_quality_score_frame
        from polars_net_spark.llm.splits import hash_bucket
        from pyspark.sql import functions as F

        weights = [1.0, -1.0, 0.5, 2.0]
        df = pl.from_records([(1, "Alpha beta beta"), (2, ""), (3, None)], ["doc_id", "text"])
        out = {
            r["doc_id"]: r
            for r in linear_quality_score_frame(df, weights, bias=0.2).spark.collect()
        }
        # replicate: bucket per lowercased word via the same hash
        b = spark.createDataFrame([("alpha",), ("beta",)], "w string").select(
            "w", hash_bucket(F.col("w"), "lq", 4).alias("b")
        ).collect()
        buckets = {r["w"]: r["b"] for r in b}
        contrib = weights[buckets["alpha"]] + 2 * weights[buckets["beta"]]
        want = 1 / (1 + math.exp(-(0.2 + contrib / 3)))
        assert out[1]["q_score"] == pytest.approx(want, abs=1e-6)
        assert out[1]["n_words"] == 3
        assert out[1]["keep"] == (out[1]["q_score"] >= 0.5)
        assert out[2]["n_words"] == 0 and out[2]["q_score"] == pytest.approx(
            1 / (1 + math.exp(-0.2)), abs=1e-6
        )

    def test_no_udf_no_shuffle_plan(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import linear_quality_score_frame

        df = pl.from_records([(1, "x y z")], ["doc_id", "text"])
        txt = (
            linear_quality_score_frame(df, [0.1, 0.2], bias=0.0)
            .spark._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
        assert "Exchange hashpartitioning" not in txt

    def test_empty_weights(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import linear_quality_score_frame
        import pytest as _pt

        df = pl.from_records([(1, "x")], ["doc_id", "text"])
        with _pt.raises(ValueError):
            linear_quality_score_frame(df, [])


class TestTermDFWinsorize:
    def test_term_df(self, spark):
        from polars_net_spark.llm import term_document_frequency

        df = pl.from_records(
            [(1, "a b a"), (2, "a c"), (3, "b b")], ["doc_id", "text"]
        )
        out = {r["term"]: r for r in term_document_frequency(df).spark.collect()}
        assert out["a"]["df"] == 2 and out["a"]["total_tf"] == 3
        assert out["b"]["df"] == 2 and out["b"]["total_tf"] == 3
        assert out["c"]["df"] == 1
        assert out["a"]["df_frac"] == pytest.approx(2 / 3, abs=1e-6)
        assert out["a"]["idf"] == pytest.approx(math.log(4 / 3) + 1, abs=1e-6)
        pruned = term_document_frequency(df, min_df=2).spark.collect()
        assert sorted(r["term"] for r in pruned) == ["a", "b"]

    def test_winsorize(self, spark):
        df = pl.from_records([(float(i),) for i in range(1, 101)], ["x"])
        out = df.lazy().winsorize("x", 0.05, 0.95, out_col="w").collect().rows()
        ws = sorted(r[1] for r in out)
        # exact linear-interp quantiles of 1..100: 5.95 and 95.05
        assert ws[0] == pytest.approx(5.95)
        assert ws[-1] == pytest.approx(95.05)
        assert ws[50] == 51.0  # middle untouched
        import pytest as _pt

        with _pt.raises(ValueError):
            df.lazy().winsorize("x", 0.9, 0.1)

    def test_winsorize_approx(self, spark):
        """approx=True (percentile_approx sketch — the 100 TB path) clips to
        boundaries within rank tolerance of the exact ones."""
        df = pl.from_records([(float(i),) for i in range(1, 1001)], ["x"])
        out = df.lazy().winsorize("x", 0.05, 0.95, out_col="w", approx=True).collect().rows()
        ws = sorted(r[1] for r in out)
        # GK sketch at default accuracy: boundary within ~1 rank of exact
        assert ws[0] == pytest.approx(50.95, abs=2.0)
        assert ws[-1] == pytest.approx(950.05, abs=2.0)
        assert ws[500] == 501.0  # middle untouched either way


class TestBigramLM:
    def test_backoff_and_short_docs(self, spark):
        import math
        from polars_net_spark.llm import bigram_logprob_frame

        d = pl.from_records(
            [(1, "the cat sat on the mat"), (2, "the cat sat"), (3, "zz"), (4, None)],
            ["doc_id", "text"],
        ).lazy()
        out = {r[0]: (r[1], r[2]) for r in bigram_logprob_frame(d, vocab_size=100).collect().rows()}
        # doc2: p(cat|the)=2/3, p(sat|cat)=2/2 -> mean log10 = log10(2/3)/2
        assert out[2][0] == 2
        assert out[2][1] == pytest.approx(round(math.log10(2 / 3) / 2, 6))
        assert out[3] == (0, 0.0) and out[4] == (0, 0.0)
        pl.release_caches()

    def test_vocab_cap_backs_off(self, spark):
        from polars_net_spark.llm import bigram_logprob_frame

        d = pl.from_records(
            [(1, "a b a b"), (2, "c d")], ["doc_id", "text"]
        ).lazy()
        # vocab_size=1 keeps only the most frequent bigram; everything else
        # takes the 0.4-backoff path (strictly lower prob than in-vocab)
        out = {r[0]: r[2] for r in bigram_logprob_frame(d, vocab_size=1).collect().rows()}
        full = {r[0]: r[2] for r in bigram_logprob_frame(d, vocab_size=100).collect().rows()}
        assert out[2] <= full[2]
        pl.release_caches()


class TestTrainLinearQuality:
    def test_train_serve_consistency(self, spark):
        """Serving scores (linear_quality_score_frame with the trained
        weights) must equal MLlib's own predicted probabilities — feature
        parity between the HOF path and the vector path is by construction."""
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.functions import array_to_vector, vector_to_array
        from pyspark.sql import functions as F

        from polars_net_spark.llm import linear_quality_score_frame, train_linear_quality

        rows = []
        for i in range(30):
            rows.append((i, "good clean well formed sentence with many words", 1))
            rows.append((100 + i, "spam buy now click spam spam", 0))
        sdf = spark.createDataFrame(rows, "doc_id long, text string, label int")
        w, b = train_linear_quality(sdf, num_buckets=64)
        assert len(w) == 64
        served = {
            r["doc_id"]: r["q_score"]
            for r in linear_quality_score_frame(sdf, w, bias=b).spark.collect()
        }
        assert served[0] > 0.9 and served[100] < 0.1
        assert served[0] == served[29] and served[100] == served[129]  # identical docs

    def test_separation_and_keep_flag(self, spark):
        from polars_net_spark.llm import linear_quality_score_frame, train_linear_quality

        rows = [(1, "alpha beta gamma", 1), (2, "zeta eta theta", 0)] * 10
        sdf = spark.createDataFrame(
            [(i, t, l) for i, (_, t, l) in enumerate(rows)], "doc_id long, text string, label int"
        )
        w, b = train_linear_quality(sdf, num_buckets=32)
        out = {r["doc_id"]: r["keep"] for r in
               linear_quality_score_frame(sdf, w, bias=b).spark.collect()}
        assert out[0] is True and out[1] is False


def test_tfidf_cosine_pairs_exact(spark):
    import math

    import polars_net_spark as pl
    from polars_net_spark.llm import tfidf_cosine_pairs

    rows = [
        (1, "apple banana cherry"),
        (2, "apple banana dates"),      # shares 2 of 3 with doc 1
        (3, "xylophone zebra quartz"),  # disjoint
    ]
    d = pl.from_records(rows, ["doc_id", "text"])
    out = tfidf_cosine_pairs(d, threshold=0.1, max_df_ratio=1.0).collect().rows()
    assert [(a, b) for a, b, _ in out] == [(1, 2)]
    # closed form: shared terms apple/banana have df=2, unique terms df=1, N=3
    idf2 = math.log(4 / 3) + 1
    idf1 = math.log(4 / 2) + 1
    dot = 2 * idf2 * idf2
    nrm = math.sqrt(2 * idf2**2 + idf1**2)
    assert abs(out[0][2] - round(dot / (nrm * nrm), 6)) < 1e-9
    # df cap removes the shared terms -> no pair survives
    out2 = tfidf_cosine_pairs(d, threshold=0.1, max_df_ratio=0.5).collect().rows()
    assert out2 == []


class TestEvaluation:
    def test_roc_auc_known(self, spark):
        from polars_net_spark.llm import roc_auc
        from pyspark.sql import functions as F

        sep = spark.range(0, 100).select(
            (F.col("id") / 100.0).alias("s"), (F.col("id") >= 50).cast("int").alias("y")
        )
        assert roc_auc(sep, "s", "y").collect().rows() == [(1.0, 50, 50)]
        # constant scores: AUC = 0.5 by tie half-credit
        const = spark.range(0, 100).select(
            F.lit(0.7).alias("s"), (F.col("id") % 2).cast("int").alias("y")
        )
        assert roc_auc(const, "s", "y").collect().rows() == [(0.5, 50, 50)]

    def test_prf1_and_calibration(self, spark):
        from polars_net_spark.llm import calibration_report, prf1_report
        from pyspark.sql import functions as F

        d = spark.range(0, 100).select(
            (F.col("id") / 100.0).alias("s"), (F.col("id") >= 50).cast("int").alias("y")
        )
        rows = prf1_report(d, "s", "y", [0.5, 0.99]).collect().rows()
        by_t = {r[0]: r for r in rows}
        assert by_t[0.5][1:5] == (1.0, 1.0, 1.0, 1.0)
        # at 0.99 only score 0.99 predicted positive -> precision 1, recall 1/50
        assert by_t[0.99][1] == 1.0 and by_t[0.99][2] == 0.02
        cal = calibration_report(d, "s", "y", n_bins=2).collect().rows()
        assert sorted(r[0] for r in cal) == [0, 1]
        low = [r for r in cal if r[0] == 0][0]
        assert low[2] == 0.0 and low[3] == 50  # low bin: no positives


def test_ndcg_and_ece(spark):
    from polars_net_spark.llm import expected_calibration_error, ndcg_at_k
    from pyspark.sql import functions as F

    rows = [(1, 3.0, 3.0), (1, 2.0, 2.0), (1, 1.0, 1.0),
            (2, 1.0, 3.0), (2, 2.0, 2.0), (2, 3.0, 1.0),
            (3, 9.0, 0.0), (3, 8.0, 0.0)]  # zero relevance -> null
    d = spark.createDataFrame(rows, ["q", "score", "rel"])
    out = dict(ndcg_at_k(d, "q", "score", "rel", k=3).collect().rows())
    assert out[1] == 1.0          # perfect ranking
    assert 0.7 < out[2] < 0.8     # inverted
    assert out[3] is None         # no relevant docs
    e = spark.range(0, 100).select(
        (F.col("id") / 100).alias("s"), (F.col("id") >= 50).cast("int").alias("y")
    )
    (ece, mce, n), = expected_calibration_error(e, "s", "y", n_bins=2).collect().rows()
    assert (ece, n) == (0.25, 100) and mce >= ece


def test_average_precision_known(spark):
    from polars_net_spark.llm import average_precision

    d = spark.createDataFrame([(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)], ["s", "y"])
    assert average_precision(d, "s", "y").collect().rows() == [(0.833333, 2, 4)]
    # all positives ranked first -> AP = 1
    top = spark.createDataFrame([(0.9, 1), (0.8, 1), (0.1, 0)], ["s", "y"])
    assert average_precision(top, "s", "y").collect().rows()[0][0] == 1.0
    # no positives -> null
    none = spark.createDataFrame([(0.9, 0), (0.8, 0)], ["s", "y"])
    assert average_precision(none, "s", "y").collect().rows()[0][0] is None


def test_isotonic_calibration_roundtrip(spark):
    from polars_net_spark.llm import apply_isotonic, calibrate_isotonic
    from pyspark.sql import functions as F

    # deterministic miscalibrated data: P(y|s) = s^2 via hash draw
    d = spark.range(0, 2000).select(
        ((F.col("id") % 100) / 100.0).alias("s"),
        (
            (F.xxhash64("id") % 1000 + 1000) % 1000 / 1000.0
            < ((F.col("id") % 100) / 100.0) ** 2
        ).cast("int").alias("y"),
    )
    cal = calibrate_isotonic(d, "s", "y")
    knots = cal.collect().rows()
    assert len(knots) >= 2
    # knot predictions are non-decreasing (isotonic contract)
    preds = [p for _, p in sorted(knots)]
    assert all(a <= b + 1e-12 for a, b in zip(preds, preds[1:]))
    out = apply_isotonic(d.select("s").distinct(), cal, "s").spark.orderBy("s").collect()
    vals = [r["calibrated"] for r in out]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))  # monotone serve
    assert 0.0 <= vals[0] and vals[-1] <= 1.0
    # calibrated curve tracks s^2 better than identity: compare MSE vs true p
    import statistics
    svals = [r["s"] for r in out]
    mse_cal = statistics.mean((v - s * s) ** 2 for v, s in zip(vals, svals))
    mse_raw = statistics.mean((s - s * s) ** 2 for s in svals)
    assert mse_cal < mse_raw


class TestRetrievalEvalExtras:
    def test_mrr_at_k_known(self, spark):
        from polars_net_spark.llm import mrr_at_k

        # q1: relevant doc at model rank 2 -> rr = 0.5
        # q2: first relevant at rank 1 -> rr = 1.0
        # q3: relevant exists but only at rank 3 with k=2 -> rr = 0
        rows = [
            ("q1", 0.9, 0.0), ("q1", 0.8, 1.0), ("q1", 0.7, 0.0),
            ("q2", 0.9, 1.0), ("q2", 0.5, 0.0),
            ("q3", 0.9, 0.0), ("q3", 0.8, 0.0), ("q3", 0.7, 1.0),
        ]
        d = spark.createDataFrame(rows, ["q", "s", "r"])
        out = dict((r[0], r[1]) for r in mrr_at_k(d, "q", "s", "r", k=2).collect().rows())
        assert out == {"q1": 0.5, "q2": 1.0, "q3": 0.0}

    def test_mrr_tie_optimistic(self, spark):
        from polars_net_spark.llm import mrr_at_k

        # relevant ties an irrelevant at the same score -> relevance-desc
        # tiebreak puts the relevant first (rr = 1.0, deterministic)
        d = spark.createDataFrame(
            [("q", 0.5, 1.0), ("q", 0.5, 0.0)], ["q", "s", "r"]
        )
        assert mrr_at_k(d, "q", "s", "r", k=2).collect().rows() == [("q", 1.0)]

    def test_recall_at_k_known(self, spark):
        from polars_net_spark.llm import recall_at_k

        # q1: 3 relevant, 2 inside top-3 -> 2/3; q2: no relevant -> null
        rows = [
            ("q1", 0.9, 1.0), ("q1", 0.8, 0.0), ("q1", 0.7, 1.0),
            ("q1", 0.6, 1.0), ("q1", 0.5, 0.0),
            ("q2", 0.9, 0.0), ("q2", 0.8, 0.0),
        ]
        d = spark.createDataFrame(rows, ["q", "s", "r"])
        got = {r[0]: (r[1], r[2]) for r in recall_at_k(d, "q", "s", "r", k=3).collect().rows()}
        assert got["q1"] == (round(2 / 3, 6), 3)
        assert got["q2"] == (None, 0)


class TestCohensKappa:
    def test_known_value(self, spark):
        from polars_net_spark.operators.regression import cohens_kappa

        a = ["y", "y", "y", "y", "y", "y", "y", "n", "n", "n"]
        b = ["y", "y", "y", "y", "y", "n", "n", "y", "n", "n"]
        d = spark.createDataFrame(list(zip(a, b)), ["ra", "rb"])
        (kappa, po, pe, n), = cohens_kappa(d, "ra", "rb").collect().rows()
        assert n == 10 and po == 0.7
        assert pe == round(0.7 * 0.6 + 0.3 * 0.4, 6)
        assert kappa == round((0.7 - 0.54) / (1 - 0.54), 6)

    def test_perfect_chance_agreement_null(self, spark):
        from polars_net_spark.operators.regression import cohens_kappa

        d = spark.createDataFrame([("x", "x")] * 5, ["ra", "rb"])
        (kappa, po, pe, n), = cohens_kappa(d, "ra", "rb").collect().rows()
        assert kappa is None and po == 1.0 and pe == 1.0

    def test_nulls_excluded(self, spark):
        from polars_net_spark.operators.regression import cohens_kappa

        d = spark.createDataFrame(
            [("a", "a"), ("b", "b"), ("a", None), (None, "b")], ["ra", "rb"]
        )
        (kappa, po, pe, n), = cohens_kappa(d, "ra", "rb").collect().rows()
        assert n == 2 and po == 1.0 and kappa == 1.0


class TestCorpusDivergence:
    def test_identical_zero(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import corpus_divergence

        a = pl.from_records([(1, "alpha beta gamma"), (2, "beta beta")], ["doc_id", "text"])
        out = corpus_divergence(a, a).collect().rows()[0]
        assert out[0] == 0.0                      # js
        assert out[1] == out[2] == out[3] == 3    # vocabs all shared

    def test_disjoint_one_bit(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import corpus_divergence

        a = pl.from_records([(1, "aa bb")], ["doc_id", "text"])
        b = pl.from_records([(1, "cc dd")], ["doc_id", "text"])
        out = corpus_divergence(a, b).collect().rows()[0]
        assert out[0] == 1.0 and out[3] == 0

    def test_halfway_closed_form(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import corpus_divergence

        a = pl.from_records([(1, "a a")], ["doc_id", "text"])
        b = pl.from_records([(1, "a b")], ["doc_id", "text"])
        import math
        p_term = 0.5 * math.log2(1 / 0.75)
        q_term = 0.5 * (0.5 * math.log2(0.5 / 0.75) + 0.5 * math.log2(0.5 / 0.25))
        out = corpus_divergence(a, b).collect().rows()[0]
        assert out[0] == round(p_term + q_term, 6)
        assert (out[4], out[5]) == (2, 2)         # token totals


class TestWordEntropy:
    def test_closed_forms(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import word_entropy_frame

        d = pl.from_records(
            [(1, "a a b b"), (2, "a a a a"), (3, "a b c d"), (4, ""), (5, "Mixed MIXED mixed")],
            ["doc_id", "text"],
        )
        got = {r[0]: (r[1], r[2]) for r in
               word_entropy_frame(d).collect().select("doc_id", "n_words", "word_entropy").rows()}
        assert got[1] == (4, 1.0)        # two runs of two -> 1 bit
        assert got[2] == (4, 0.0)        # single word repeated -> 0 bits
        assert got[3] == (4, 2.0)        # four distinct -> 2 bits
        assert got[4] == (0, None)       # empty doc -> null entropy
        assert got[5] == (3, 0.0)        # lowercased -> one run

    def test_two_bits(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.llm import word_entropy_frame

        d = pl.from_records([(1, "w x y z")], ["doc_id", "text"])
        (row,) = word_entropy_frame(d).collect().select("n_words", "word_entropy").rows()
        assert row == (4, 2.0)


class TestFleissKappa:
    def test_known_value(self, spark):
        from polars_net_spark.operators.regression import fleiss_kappa

        # 3 items x 2 raters: (A,A), (A,B), (B,B) -> P_i = 1, 0, 1;
        # p_A = p_B = 0.5 -> Pe = 0.5; kappa = (2/3 - 1/2)/(1/2) = 1/3
        rows = [(1, "A"), (1, "A"), (2, "A"), (2, "B"), (3, "B"), (3, "B")]
        d = spark.createDataFrame(rows, ["item", "cat"])
        (kappa, p_bar, p_e, n_items, n_ratings), = fleiss_kappa(d, "item", "cat").collect().rows()
        assert kappa == round(1 / 3, 6)
        assert p_bar == round(2 / 3, 6) and p_e == 0.5
        assert n_items == 3 and n_ratings == 6

    def test_single_rating_items_excluded(self, spark):
        from polars_net_spark.operators.regression import fleiss_kappa

        rows = [(1, "A"), (1, "A"), (2, "A"), (2, "B"), (3, "B"), (3, "B"),
                (4, "C")]  # item 4 has one rating: no agreement signal
        d = spark.createDataFrame(rows, ["item", "cat"])
        (kappa, p_bar, p_e, n_items, n_ratings), = fleiss_kappa(d, "item", "cat").collect().rows()
        assert kappa == round(1 / 3, 6)  # identical to the 3-item case
        assert n_items == 3 and n_ratings == 6

    def test_all_one_category_null(self, spark):
        from polars_net_spark.operators.regression import fleiss_kappa

        d = spark.createDataFrame([(1, "x"), (1, "x"), (2, "x"), (2, "x")], ["item", "cat"])
        (kappa, p_bar, p_e, _, _), = fleiss_kappa(d, "item", "cat").collect().rows()
        assert kappa is None and p_bar == 1.0 and p_e == 1.0


class TestClassificationLoss:
    def test_known_value(self, spark):
        import math

        from polars_net_spark.llm import classification_loss

        d = spark.createDataFrame([(0.9, 1), (0.1, 0)], ["p", "y"])
        (ll, brier, pos, n), = classification_loss(d, "p", "y").collect().rows()
        assert ll == round(-math.log(0.9), 6)
        assert brier == 0.01 and pos == 0.5 and n == 2

    def test_confident_miss_clipped_finite(self, spark):
        import math

        from polars_net_spark.llm import classification_loss

        d = spark.createDataFrame([(0.0, 1)], ["p", "y"])
        (ll, brier, pos, n), = classification_loss(d, "p", "y").collect().rows()
        assert ll == round(-math.log(1e-15), 6) and brier == 1.0

    def test_per_key(self, spark):
        from polars_net_spark.llm import classification_loss

        d = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 0.0, 0), ("b", 0.5, 1)], ["k", "p", "y"]
        )
        got = {r[0]: r[1:] for r in classification_loss(d, "p", "y", by="k").collect().rows()}
        assert got["a"][0] == round(-__import__("math").log(1 - 1e-15), 6)
        assert got["b"][1] == 0.25  # brier (0.5-1)^2


class TestPSIReport:
    def test_identical_distributions_zero(self, spark):
        from polars_net_spark.operators.analytics import psi_report

        vals = [(float(i),) for i in range(10)]
        ref = spark.createDataFrame(vals, ["value"])
        cur = spark.createDataFrame(vals, ["value"])
        rows = psi_report(ref, cur, "value", n_bins=5).collect().rows()
        assert len(rows) == 5
        assert all(r[5] == 0.0 for r in rows)
        assert all(r[3] == r[4] for r in rows)

    def test_empty_bins_materialized_with_eps(self, spark):
        from polars_net_spark.operators.analytics import psi_report

        ref = spark.createDataFrame([(0.0,), (10.0,)], ["value"])
        cur = spark.createDataFrame([(0.0,), (10.0,)], ["value"])
        rows = sorted(psi_report(ref, cur, "value", n_bins=5).collect().rows())
        assert len(rows) == 5
        # middle bins are empty on both sides: floored at eps, psi_term 0
        assert rows[2][3] == 1e-06 and rows[2][4] == 1e-06 and rows[2][5] == 0.0

    def test_shift_detected_and_clamped(self, spark):
        from polars_net_spark.operators.analytics import psi_report

        ref = spark.createDataFrame([(float(i),) for i in range(10)], ["value"])
        cur = spark.createDataFrame([(float(i) + 50,) for i in range(10)], ["value"])
        rows = psi_report(ref, cur, "value", n_bins=5).collect().rows()
        # all current mass clamps into the top bin -> large positive PSI
        total = sum(r[5] for r in rows)
        assert total > 1.0
        top = [r for r in rows if r[0] == 4][0]
        assert top[4] == 1.0

    def test_explicit_breaks(self, spark):
        from polars_net_spark.operators.analytics import psi_report

        ref = spark.createDataFrame([(1.0,), (6.0,)], ["value"])
        cur = spark.createDataFrame([(-5.0,), (99.0,)], ["value"])
        rows = sorted(psi_report(ref, cur, "value", breaks=[0.0, 5.0, 10.0]).collect().rows())
        assert [r[0] for r in rows] == [0, 1]
        assert rows[0][1] == 0.0 and rows[0][2] == 5.0
        assert rows[0][3] == 0.5 and rows[1][3] == 0.5
        # out-of-range current values clamp into the edge bins
        assert rows[0][4] == 0.5 and rows[1][4] == 0.5

    def test_bad_breaks_raise(self, spark):
        import pytest as _pytest

        from polars_net_spark.operators.analytics import psi_report

        ref = spark.createDataFrame([(1.0,)], ["value"])
        with _pytest.raises(ValueError):
            psi_report(ref, ref, "value", breaks=[5.0, 0.0])


class TestKAnonymity:
    def test_report(self, spark):
        from polars_net_spark.operators.analytics import k_anonymity_report

        d = spark.createDataFrame(
            [("a", 1), ("a", 1), ("a", 1), ("b", 2)], ["q1", "q2"]
        )
        (mk, ng, nvg, nvr, nr), = k_anonymity_report(d, ["q1", "q2"], k=2).collect().rows()
        assert (mk, ng, nvg, nvr, nr) == (1, 2, 1, 1, 4)

    def test_with_flags_and_null_class(self, spark):
        from polars_net_spark.operators.analytics import with_k_anonymity

        d = spark.createDataFrame(
            [("a",), ("a",), (None,), (None,), (None,)], "q1: string"
        )
        rows = with_k_anonymity(d, ["q1"], k=3).collect().rows()
        by_q = {}
        for q, sz, flag in rows:
            by_q[q] = (sz, flag)
        assert by_q["a"] == (2, False)
        assert by_q[None] == (3, True)  # NULLs form their own class

    def test_empty_quasi_raises(self, spark):
        import pytest as _pytest

        from polars_net_spark.operators.analytics import k_anonymity_report

        d = spark.createDataFrame([(1,)], ["x"])
        with _pytest.raises(ValueError):
            k_anonymity_report(d, [], k=2)


class TestReadability:
    def test_known_value(self, spark):
        from polars_net_spark.llm import readability_frame

        d = spark.createDataFrame([(1, "The cat sat. It ran!")], ["doc_id", "text"])
        (i, nw, ns, syl, fre, fk), = readability_frame(d, "text", "doc_id").collect().rows()
        assert (nw, ns, syl) == (5, 2, 5)
        assert fre == round(206.835 - 1.015 * 2.5 - 84.6 * 1.0, 6)
        assert fk == round(0.39 * 2.5 + 11.8 * 1.0 - 15.59, 6)

    def test_empty_doc_null_scores(self, spark):
        from polars_net_spark.llm import readability_frame

        d = spark.createDataFrame([(1, "")], ["doc_id", "text"])
        (i, nw, ns, syl, fre, fk), = readability_frame(d, "text", "doc_id").collect().rows()
        assert nw == 0 and fre is None and fk is None

    def test_vowelless_words_floor_one_syllable(self, spark):
        from polars_net_spark.llm import readability_frame

        d = spark.createDataFrame([(1, "hmm pfft tsk")], ["doc_id", "text"])
        (_, nw, ns, syl, _, _), = readability_frame(d, "text", "doc_id").collect().rows()
        assert nw == 3 and ns == 1 and syl == 3


class TestRRFFuse:
    def test_known_fusion(self, spark):
        from polars_net_spark.llm.retrieval import rrf_fuse

        rows = [
            ("q1", "d1", "bm25", 1), ("q1", "d2", "bm25", 2),
            ("q1", "d2", "dense", 1), ("q1", "d3", "dense", 2),
        ]
        d = spark.createDataFrame(rows, ["query_id", "doc_id", "ranker", "rank"])
        got = {r[1]: (r[2], r[3]) for r in rrf_fuse(d, k=60).collect().rows()}
        # d2 appears in both lists -> highest fused score
        assert got["d2"] == (round(1 / 62 + 1 / 61, 6), 1)
        assert got["d1"] == (round(1 / 61, 6), 2)  # tie with d3 at 1/61? no: d3=1/62
        assert got["d3"] == (round(1 / 62, 6), 3)

    def test_tie_breaks_by_doc(self, spark):
        from polars_net_spark.llm.retrieval import rrf_fuse

        rows = [("q", "b", "r1", 1), ("q", "a", "r2", 1)]
        d = spark.createDataFrame(rows, ["query_id", "doc_id", "ranker", "rank"])
        got = {r[1]: r[3] for r in rrf_fuse(d).collect().rows()}
        assert got["a"] == 1 and got["b"] == 2

    def test_top_n(self, spark):
        from polars_net_spark.llm.retrieval import rrf_fuse

        rows = [("q", f"d{i}", "r", i) for i in range(1, 6)]
        d = spark.createDataFrame(rows, ["query_id", "doc_id", "ranker", "rank"])
        out = rrf_fuse(d, top_n=2).collect().rows()
        assert len(out) == 2 and {r[1] for r in out} == {"d1", "d2"}


class TestPropZTest:
    def test_known_value(self, spark):
        from polars_net_spark.operators.regression import prop_ztest

        # arm a: 30/100 convert, arm b: 20/100 convert
        rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 20 + [("b", 0)] * 80
        d = spark.createDataFrame(rows, ["arm", "y"])
        (z, pa, pb, na, nb), = prop_ztest(d, "arm", "y", "a", "b").collect().rows()
        assert (pa, pb, na, nb) == (0.3, 0.2, 100, 100)
        pool = 0.25
        se = (pool * 0.75 * (0.01 + 0.01)) ** 0.5
        assert z == round(0.1 / se, 6)

    def test_degenerate_pool_null(self, spark):
        from polars_net_spark.operators.regression import prop_ztest

        d = spark.createDataFrame([("a", 1), ("b", 1)], ["arm", "y"])
        (z, pa, pb, _, _), = prop_ztest(d, "arm", "y", "a", "b").collect().rows()
        assert z is None and pa == 1.0 and pb == 1.0
