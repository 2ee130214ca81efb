"""Statistical aggregates (skew/kurtosis/entropy/product, corr/cov) and
run/peak window ops (rle_id, peak_max/peak_min) — polars-parity extras,
all pure Column expressions (no UDFs, map-side-combinable aggregates)."""

import math

import pytest

import polars_net_spark as pl
from polars_net_spark import col


def test_skew_biased_and_corrected(spark):
    df = pl.from_records([(1.0,), (2.0,), (9.0,)], ["x"])
    r = df.lazy().group_by().agg(
        col("x").skew().alias("b"), col("x").skew(bias=False).alias("u")
    ).collect().rows()[0]
    m2 = (9 + 4 + 25) / 3
    m3 = (-27 - 8 + 125) / 3
    g1 = m3 / m2**1.5
    assert r[0] == pytest.approx(g1)
    n = 3
    assert r[1] == pytest.approx(math.sqrt(n * (n - 1)) / (n - 2) * g1)


def test_kurtosis_variants(spark):
    xs = [1.0, 2.0, 4.0, 8.0, 16.0]
    df = pl.from_records([(x,) for x in xs], ["x"])
    r = df.lazy().group_by().agg(
        col("x").kurtosis().alias("f"),
        col("x").kurtosis(fisher=False).alias("p"),
        col("x").kurtosis(bias=False).alias("u"),
    ).collect().rows()[0]
    n = len(xs)
    mean = sum(xs) / n
    m2 = sum((x - mean) ** 2 for x in xs) / n
    m4 = sum((x - mean) ** 4 for x in xs) / n
    g2 = m4 / m2**2 - 3
    assert r[0] == pytest.approx(g2)
    assert r[1] == pytest.approx(g2 + 3)
    assert r[2] == pytest.approx((n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6))


def test_entropy(spark):
    xs = [1.0, 1.0, 2.0]
    df = pl.from_records([(x,) for x in xs], ["x"])
    r = df.lazy().group_by().agg(
        col("x").entropy().alias("h"), col("x").entropy(base=2).alias("h2")
    ).collect().rows()[0]
    s = sum(xs)
    h = -sum((x / s) * math.log(x / s) for x in xs)
    assert r[0] == pytest.approx(h)
    assert r[1] == pytest.approx(h / math.log(2))


def test_product_signs_and_zero(spark):
    df = pl.from_records(
        [("a", 2.0), ("a", -3.0), ("a", 4.0), ("b", 5.0), ("b", 0.0)], ["g", "x"]
    )
    out = df.lazy().group_by("g").agg(col("x").product().alias("p")).sort("g").collect()
    assert out.rows() == [("a", -24.0), ("b", 0.0)]


def test_corr_cov(spark):
    rows = [(1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.2)]
    df = pl.from_records(rows, ["x", "y"])
    r = df.lazy().group_by().agg(
        pl.corr("x", "y").alias("r"),
        pl.cov("x", "y").alias("cs"),
        pl.cov("x", "y", ddof=0).alias("cp"),
    ).collect().rows()[0]
    n = len(rows)
    mx = sum(x for x, _ in rows) / n
    my = sum(y for _, y in rows) / n
    cp = sum((x - mx) * (y - my) for x, y in rows) / n
    cs = cp * n / (n - 1)
    sx = math.sqrt(sum((x - mx) ** 2 for x, _ in rows) / n)
    sy = math.sqrt(sum((y - my) ** 2 for _, y in rows) / n)
    assert r[0] == pytest.approx(cp / (sx * sy))
    assert r[1] == pytest.approx(cs)
    assert r[2] == pytest.approx(cp)


def test_rle_id(spark):
    xs = ["a", "a", "b", "b", "b", "a", None, None, "c"]
    df = pl.from_records(list(enumerate(xs)), ["i", "x"])
    out = df.with_columns(col("x").rle_id(order_by=[col("i")]).alias("r")).sort("i")
    assert [r[-1] for r in out.rows()] == [0, 0, 1, 1, 1, 2, 3, 3, 4]


def test_rle_id_partitioned(spark):
    rows = [(0, "k1", 1), (1, "k1", 1), (2, "k1", 2), (0, "k2", 5), (1, "k2", 6)]
    df = pl.from_records(rows, ["i", "k", "x"])
    out = df.with_columns(
        col("x").rle_id(order_by=[col("i")], partition_by=["k"]).alias("r")
    ).sort("k", "i")
    assert [r[-1] for r in out.rows()] == [0, 0, 1, 0, 1]


def test_peak_max_min(spark):
    xs = [1.0, 3.0, 2.0, 5.0, 5.0, 4.0, 6.0]
    df = pl.from_records(list(enumerate(xs)), ["i", "x"])
    out = df.with_columns(
        col("x").peak_max(order_by=[col("i")]).alias("mx"),
        col("x").peak_min(order_by=[col("i")]).alias("mn"),
    ).sort("i")
    # plateaus (5,5) are not strict peaks; edges count vs their one neighbor
    assert [r[-2] for r in out.rows()] == [False, True, False, False, False, False, True]
    assert [r[-1] for r in out.rows()] == [True, False, True, False, False, True, False]


def test_replace_keeps_unmatched(spark):
    df = pl.from_records([("N",), ("A",), ("X",), (None,)], ["f"])
    out = df.with_columns(
        col("f").replace({"N": "none", "A": "acc"}).alias("r")
    )
    assert sorted(r[1] for r in out.rows() if r[1] is not None) == ["X", "acc", "none"]
    assert any(r[0] is None and r[1] is None for r in out.rows())


def test_replace_null_key(spark):
    df = pl.from_records([("N",), (None,)], ["f"])
    out = df.with_columns(col("f").replace({None: "missing"}).alias("r"))
    assert sorted(r[1] for r in out.rows()) == ["N", "missing"]


def test_replace_strict_default_and_abort(spark):
    df = pl.from_records([("N",), ("X",)], ["f"])
    out = df.with_columns(
        col("f").replace_strict({"N": 1}, default=0).alias("r")
    )
    assert sorted(r[1] for r in out.rows()) == [0, 1]
    strict = df.with_columns(col("f").replace_strict({"N": 1}).alias("r"))
    with pytest.raises(Exception, match="not in mapping"):
        strict.rows()


def test_repeat_by_and_hash(spark):
    df = pl.from_records([("a", 3), ("b", 0)], ["v", "n"])
    out = df.with_columns(
        col("v").repeat_by(col("n")).alias("rep"),
        col("v").hash().alias("h"),
        col("v").hash(seed=7).alias("h7"),
    ).sort("v")
    rows = out.rows()
    assert rows[0][2] == ["a", "a", "a"] and rows[1][2] == []
    assert isinstance(rows[0][3], int) and rows[0][3] != rows[0][4]  # seed changes hash
    # deterministic across evaluation
    assert out.rows()[0][3] == rows[0][3]


def test_list_eval_filter(spark):
    df = pl.from_records([([1, 2, 3, 4],)], ["xs"])
    out = df.with_columns(
        col("xs").list.eval(lambda e: e * 10).alias("t"),
        col("xs").list.filter(lambda e: e % 2 == 0).alias("f"),
    )
    r = out.rows()[0]
    assert r[1] == [10, 20, 30, 40]
    assert r[2] == [2, 4]


def test_approx_quantile_close_to_exact(spark):
    df = pl.from_records([(float(i),) for i in range(1, 1001)], ["x"])
    r = df.lazy().group_by().agg(
        col("x").approx_quantile(0.5).alias("a"),
        col("x").quantile(0.5, interpolation="lower").alias("e"),
    ).collect().rows()[0]
    assert abs(r[0] - r[1]) <= 2  # rank error bound at accuracy=10000


class TestRegressionOps:
    def test_fit_linear_exact_line(self, spark):
        from polars_net_spark.operators.regression import fit_linear_by_key

        rows = [("a", float(x), 2.0 * x + 1.0) for x in range(10)]
        rows += [("b", float(x), 5.0) for x in range(5)]       # zero slope
        rows += [("c", 1.0, 1.0), ("c", 1.0, 2.0)]             # zero x-variance
        rows += [("d", 1.0, None), ("d", None, 3.0), ("d", 2.0, 7.0)]
        d = spark.createDataFrame(rows, ["k", "x", "y"])
        out = {r[0]: r[1:] for r in fit_linear_by_key(d, "k", "x", "y").collect().rows()}
        assert out["a"] == (10, 2.0, 1.0, 1.0)
        assert out["b"][:2] == (5, 0.0) and out["b"][3] is None  # r2 null (zero y-var)
        assert out["c"] == (2, None, None, None)
        assert out["d"][0] == 1 and out["d"][1] is None          # nulls excluded

    def test_key_skew_report(self, spark):
        from polars_net_spark.operators.regression import key_skew_report

        rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10
        d = spark.createDataFrame(rows, ["k"])
        out = key_skew_report(d, "k", top_k=2).collect().rows()
        assert out[0] == ("hot", 70, 0.7, 1)
        assert out[1] == ("warm", 20, 0.2, 2)


class TestAnalyticsOps:
    def test_outlier_flags_zscore_and_mad(self, spark):
        from polars_net_spark.operators.analytics import with_outlier_flags

        d = spark.createDataFrame(
            [("a", float(v)) for v in [1, 2, 1, 2, 1, 2, 100]] + [("b", 5.0), ("a", None)],
            ["k", "v"],
        )
        z = {(r[0], r[1]): r[2] for r in with_outlier_flags(d, "v", by="k").collect().rows()}
        assert z[("a", None)] is None           # null value -> null flag
        assert z[("b", 5.0)] is False           # zero spread flags nothing
        m = with_outlier_flags(d, "v", by="k", method="mad", threshold=3.5).collect().rows()
        flagged = [r[:2] for r in m if r[2]]
        assert flagged == [("a", 100.0)]        # MAD is robust to its own outlier

    def test_find_gaps(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import find_gaps

        t0 = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [(1, t0), (1, t0 + dt.timedelta(minutes=10)), (1, t0 + dt.timedelta(hours=3)), (2, t0)],
            ["u", "ts"],
        )
        out = find_gaps(ev, "ts", by="u", min_gap="1 hour").collect().rows()
        assert out == [
            (1, t0 + dt.timedelta(minutes=10), t0 + dt.timedelta(hours=3), 10200.0)
        ]

    def test_cohort_retention_week(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import cohort_retention

        rows = [
            (1, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 8)),
            (2, dt.datetime(2024, 1, 8)),
            (2, dt.datetime(2024, 1, 22)),
        ]
        out = sorted(
            cohort_retention(spark.createDataFrame(rows, ["u", "ts"]), "u", "ts", "week")
            .collect().rows()
        )
        assert out == [
            (dt.date(2024, 1, 1), 0, 1),
            (dt.date(2024, 1, 1), 1, 1),
            (dt.date(2024, 1, 8), 0, 1),
            (dt.date(2024, 1, 8), 2, 1),
        ]

    def test_funnel_order_matters(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import funnel_counts

        t0 = dt.datetime(2024, 1, 1)
        m = dt.timedelta(minutes=1)
        fr = [
            (1, "view", t0), (1, "click", t0 + m), (1, "purchase", t0 + 2 * m),
            (2, "view", t0), (2, "purchase", t0 + m),          # skips click
            (3, "click", t0), (3, "view", t0 + m),             # wrong order
            (4, "purchase", t0),                               # never viewed
        ]
        out = funnel_counts(
            spark.createDataFrame(fr, ["u", "s", "ts"]), "u", "ts", "s",
            ["view", "click", "purchase"],
        ).collect().rows()
        assert out == [("view", 1, 3), ("click", 2, 1), ("purchase", 3, 1)]


class TestCorrOps:
    def test_corr_matrix_long_format(self, spark):
        import math

        from polars_net_spark.operators.regression import corr_matrix

        rows = [(float(i), 2.0 * i, -1.0 * i + 0.0, 5.0) for i in range(10)]
        d = spark.createDataFrame(rows, ["a", "b", "c", "k"])
        out = {(r[0], r[1]): r[2] for r in corr_matrix(d, ["a", "b", "c", "k"]).collect().rows()}
        assert out[("a", "b")] == 1.0
        assert out[("a", "c")] == -1.0
        assert out[("a", "k")] is None or (isinstance(out[("a", "k")], float) and math.isnan(out[("a", "k")]))  # zero variance
        assert len(out) == 6

    def test_rolling_corr(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        rows = [("g", i, float(i), float(i) * 3.0 + 1) for i in range(6)]
        d = pl.from_records(rows, ["g", "i", "x", "y"]).lazy()
        out = d.with_columns(
            col("x").rolling_corr("y", 3, order_by=[col("i")], partition_by=["g"]).alias("rc")
        ).collect().rows()
        vals = [r[4] for r in sorted(out, key=lambda r: r[1])]
        assert vals[0] is None and vals[1] is None      # min_periods = window
        for v in vals[2:]:
            assert abs(v - 1.0) < 1e-9                  # perfectly linear


class TestTimeSeriesStats:
    def test_seasonal_decompose_additive(self, spark):
        import math

        from polars_net_spark.operators.analytics import seasonal_decompose

        # pure signal: trend 0.5*t + seasonal pattern of period 4
        pat = [2.0, -1.0, 0.5, -1.5]
        rows = [("k", t, 0.5 * t + pat[t % 4]) for t in range(40)]
        d = spark.createDataFrame(rows, ["g", "t", "v"])
        out = {r[1]: r[3:] for r in seasonal_decompose(d, "v", "t", 4, by="g").collect().rows()}
        # interior points recover the components (up to the even-period MA)
        for t in range(4, 36):
            trend, seas, resid = out[t]
            assert abs(trend - 0.5 * t) < 1e-6
            assert abs(resid) < 1e-6
        # seasonal sums to ~0 over one period
        assert abs(sum(out[10 + i][1] for i in range(4))) < 1e-6
        # edges have null trend like statsmodels
        assert out[0][0] is None and out[39][0] is None

    def test_acf_lag_structure(self, spark):
        from polars_net_spark.operators.analytics import acf

        # period-2 alternating series: acf(1) ~ -1, acf(2) ~ +1
        rows = [("k", t, float((-1) ** t)) for t in range(30)]
        d = spark.createDataFrame(rows, ["g", "t", "v"])
        out = {r[1]: r[2] for r in acf(d, "v", "t", lags=2, by="g").collect().rows()}
        assert abs(out[1] + 1.0) < 1e-6
        assert abs(out[2] - 1.0) < 1e-6

    def test_acf_canonical_matches_ljung_box_and_numpy(self, spark):
        """acf(estimator='canonical') must produce EXACTLY ljung_box's r_k
        (reconstruct Q from the acf values) and the textbook formula."""
        import math
        import random

        from polars_net_spark.operators.analytics import acf
        from polars_net_spark.operators.regression import ljung_box

        rng = random.Random(5)
        xs = [rng.gauss(0, 1) + 0.4 * math.sin(t / 3.0) for t in range(60)]
        d = spark.createDataFrame(
            [("k", t, x) for t, x in enumerate(xs)], ["g", "t", "v"]
        )
        K = 4
        r = {
            row[1]: row[2]
            for row in acf(
                d, "v", "t", lags=K, by="g", estimator="canonical", round_to=9
            ).collect().rows()
        }
        # textbook r_k
        n = len(xs)
        m = sum(xs) / n
        den = sum((x - m) ** 2 for x in xs)
        for k in range(1, K + 1):
            rk = sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n)) / den
            assert abs(r[k] - rk) < 1e-8
        # and Q reconstructed from acf == ljung_box's Q
        _, q, df, nn = ljung_box(d, "v", "t", lags=K, by="g").collect().rows()[0]
        q_from_acf = n * (n + 2) * sum(r[k] ** 2 / (n - k) for k in range(1, K + 1))
        assert abs(q - q_from_acf) < 1e-4

    def test_acf_bad_estimator_raises(self, spark):
        import pytest

        from polars_net_spark.operators.analytics import acf

        d = spark.createDataFrame([("k", 0, 1.0)], ["g", "t", "v"])
        with pytest.raises(ValueError, match="estimator"):
            acf(d, "v", "t", lags=1, estimator="spearman")

    def test_cusum_flags_level_shift(self, spark):
        from polars_net_spark.operators.analytics import cusum_flags

        rows = [("k", t, 0.0) for t in range(50)] + [("k", t, 10.0) for t in range(50, 100)]
        d = spark.createDataFrame(rows, ["g", "t", "v"])
        out = sorted(cusum_flags(d, "v", "t", by="g", threshold=3.0).collect().rows())
        flagged_ts = [r[1] for r in out if r[4]]
        assert flagged_ts  # a 2-sigma-class shift is detected
        # the changepoint property: |cusum| peaks exactly at the shift
        peak_t = max(out, key=lambda r: abs(r[3]))[1]
        assert peak_t == 49
        # and the series ends back near zero (mass balances around the mean)
        assert abs(out[-1][3]) < 1e-6

    def test_unkeyed_paths_match_keyed_no_single_partition(self, spark):
        """by=None rides distsort halo buckets / prefix offsets: results
        identical to the keyed path on single-key data, and the plan has
        no whole-data single-partition Exchange."""
        from polars_net_spark.operators.analytics import (
            acf, cusum_flags, seasonal_decompose,
        )

        pat = [2.0, -1.0, 0.5, -1.5]
        rows = [("k", t, 0.5 * t + pat[t % 4]) for t in range(40)]
        d = spark.createDataFrame(rows, ["g", "t", "v"]).repartition(6)

        def plan(lf):
            return lf.spark._jdf.queryExecution().executedPlan().toString()

        keyed = sorted(
            r[1:] for r in seasonal_decompose(d, "v", "t", 4, by="g").collect().rows()
        )
        glob = seasonal_decompose(d, "v", "t", 4)
        assert sorted(r[1:] for r in glob.collect().rows()) == keyed
        # the data-sized trend window is bucket-keyed, and no window
        # orders the raw sequence without a partition key (the old
        # single-partition signature); bounded 1-row reduces may plan as
        # SinglePartition exchanges and are fine
        p = plan(glob)
        assert "windowspecdefinition(__gb__" in p
        assert "windowspecdefinition(t#" not in p

        keyed_acf = sorted(r[1:] for r in acf(d, "v", "t", lags=3, by="g").collect().rows())
        glob_acf = acf(d, "v", "t", lags=3)
        assert sorted(glob_acf.collect().rows()) == keyed_acf
        p = plan(glob_acf)
        assert "windowspecdefinition(__gb__" in p
        assert "windowspecdefinition(t#" not in p

        keyed_cu = sorted(r[1:] for r in cusum_flags(d, "v", "t", by="g").collect().rows())
        glob_cu = cusum_flags(d, "v", "t")
        assert sorted(r[1:] for r in glob_cu.collect().rows()) == keyed_cu
        p = plan(glob_cu)
        assert "windowspecdefinition(__gb__" in p
        assert "windowspecdefinition(t#" not in p

    def test_unkeyed_halo_crosses_bucket_boundaries(self, spark):
        """Force many tiny buckets so halo exchange is actually exercised:
        results must equal the single-bucket answer."""
        from polars_net_spark.operators import distsort
        from polars_net_spark.operators.analytics import acf, seasonal_decompose

        rows = [(t, float((-1) ** t) + 0.1 * t) for t in range(60)]
        d = spark.createDataFrame(rows, ["t", "v"]).repartition(8)
        old = distsort._default_nbuckets
        distsort._default_nbuckets = lambda sdf: 7
        try:
            many = sorted(seasonal_decompose(d, "v", "t", 4).collect().rows())
            many_acf = sorted(acf(d, "v", "t", lags=2).collect().rows())
        finally:
            distsort._default_nbuckets = old
        distsort._default_nbuckets = lambda sdf: 1
        try:
            one = sorted(seasonal_decompose(d, "v", "t", 4).collect().rows())
            one_acf = sorted(acf(d, "v", "t", lags=2).collect().rows())
        finally:
            distsort._default_nbuckets = old
        # buckets THINNER than the window: single-hop halo alone would
        # starve the centered windows (the empty-output bug the full-suite
        # run caught) — bucket coalescing must keep results exact
        distsort._default_nbuckets = lambda sdf: 64
        try:
            thin = sorted(seasonal_decompose(d, "v", "t", 4).collect().rows())
            thin_acf = sorted(acf(d, "v", "t", lags=2).collect().rows())
        finally:
            distsort._default_nbuckets = old
        assert many == one == thin
        assert many_acf == one_acf == thin_acf

    def test_trimmed_mean(self, spark):
        from polars_net_spark.operators.analytics import trimmed_mean_by_key

        vals = list(range(1, 11))  # 1..10, 10% trim -> band [1.9, 9.1] -> 2..9
        d = spark.createDataFrame([("k", float(v)) for v in vals], ["g", "v"])
        out = trimmed_mean_by_key(d, "v", by="g", trim=0.1).collect().rows()
        assert out == [("k", 5.5, 8)]


def test_rank_normalized_ties_and_nulls(spark):
    from polars_net_spark.operators.analytics import with_rank_normalized

    d = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 40.0), ("a", None)], ["k", "v"]
    )
    out = sorted(with_rank_normalized(d, "v", by="k").collect().rows(), key=str)
    assert out == [
        ("a", 10.0, 0.125), ("a", 20.0, 0.5), ("a", 20.0, 0.5),
        ("a", 40.0, 0.875), ("a", None, None),
    ]


def test_rank_normalized_string_global_distributed(spark):
    # r8: the unkeyed NON-NUMERIC path now rides Spark's range-sort
    # exchange (partition id as range bucket) — exact vs the keyed window
    # on a constant key, no warning, nulls pass through
    import warnings

    from polars_net_spark.operators.analytics import with_rank_normalized

    words = [f"w{(i * 37) % 101:03d}" for i in range(300)] + ["dup"] * 20 + [None] * 5
    d = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, s string"
    ).repartition(7)
    keyed = {
        r["i"]: r["rank_norm"]
        for r in with_rank_normalized(d.withColumn("g", d.i * 0), "s", by="g")
        .spark.collect()
    }
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        glob = {
            r["i"]: r["rank_norm"] for r in with_rank_normalized(d, "s").spark.collect()
        }
    assert all(keyed[k] == glob[k] for k in keyed)
    assert all(glob[i] is None for i, w in enumerate(words) if w is None)


class TestInference:
    def test_bootstrap_ci_brackets_truth(self, spark):
        from polars_net_spark.operators.regression import bootstrap_ci
        from pyspark.sql import functions as F

        d = spark.range(0, 2000).select(
            F.col("id").alias("i"), (F.col("id") % 100).cast("double").alias("v")
        )
        (mean, lo, hi, n), = bootstrap_ci(d, "v", n_boot=50, id_col="i").collect().rows()
        assert mean == 49.5 and n == 2000
        assert lo < 49.5 < hi
        assert hi - lo < 5  # width ~ 2*1.96*sigma/sqrt(n) ≈ 2.5
        # deterministic across runs
        again = bootstrap_ci(d, "v", n_boot=50, id_col="i").collect().rows()
        assert again == [(mean, lo, hi, n)]
        import pytest
        with pytest.raises(ValueError, match="id_col"):
            bootstrap_ci(d, "v")

    def test_welch_ttest_exact(self, spark):
        import math

        from polars_net_spark.operators.regression import welch_ttest
        from pyspark.sql import functions as F

        g = spark.range(0, 1000).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
            (F.col("id") % 10 + F.when(F.col("id") % 2 == 0, 2.0).otherwise(0.0))
            .cast("double").alias("v"),
        )
        (ma, mb, diff, t, df, na, nb), = welch_ttest(g, "g", "v", "a", "b").collect().rows()
        assert (ma, mb, diff, na, nb) == (6.0, 5.0, 1.0, 500, 500)
        # equal variances and sizes: df = 2n - 2
        assert abs(df - 998.0) < 1e-6
        # t from the closed form
        var = sum((x - 4) ** 2 for x in [0, 2, 4, 6, 8]) / 5 * 500 / 499
        assert abs(t - 1.0 / math.sqrt(2 * var / 500)) < 1e-6


def test_chi2_independence(spark):
    from polars_net_spark.operators.regression import chi2_independence
    from pyspark.sql import functions as F

    # perfectly independent 2x2 -> chi2 == 0, df == 1
    ind = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("a"),
        ((F.col("id") % 4) < 2).cast("string").alias("b"),
    )
    assert chi2_independence(ind, "a", "b").collect().rows() == [(0.0, 1, 1000)]
    # perfectly dependent (a == b) -> chi2 == n
    dep = spark.range(0, 800).select(
        (F.col("id") % 2).cast("string").alias("a"),
        (F.col("id") % 2).cast("string").alias("b"),
    )
    assert chi2_independence(dep, "a", "b").collect().rows() == [(800.0, 1, 800)]


def test_mann_whitney_u_known_values(spark):
    from polars_net_spark.operators.regression import mann_whitney_u

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5]] + [
        ("b", float(v)) for v in [6, 7, 8, 9, 10]
    ]
    d = spark.createDataFrame(rows, ["g", "v"])
    out = mann_whitney_u(d, "g", "v", "a", "b").collect().rows()
    assert out == [(0.0, -2.611165, 5, 5)]  # fully separated: U=0
    rows2 = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    (u, z, na, nb), = mann_whitney_u(
        spark.createDataFrame(rows2, ["g", "v"]), "g", "v", "a", "b"
    ).collect().rows()
    # ranks: 1 -> 1; the three 2s share (2+3+4)/3 = 3; 3 -> 5
    # Ra = 1 + 3 + 3 = 7, U = 7 - 6 = 1
    assert (u, na, nb) == (1.0, 3, 2)


def test_spearman_corr(spark):
    from polars_net_spark.operators.regression import spearman_corr
    from pyspark.sql import functions as F

    # monotone nonlinear -> exactly 1 (Pearson would be < 1)
    d = spark.range(0, 100).select(
        F.col("id").cast("double").alias("a"),
        (F.col("id") * F.col("id")).cast("double").alias("b"),
    )
    assert spearman_corr(d, "a", "b").collect().rows() == [(1.0, 100)]
    # ties: [1,2,2,3] vs [10,20,20,40] still perfectly concordant
    t = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)], ["a", "b"]
    )
    assert spearman_corr(t, "a", "b").collect().rows() == [(1.0, 4)]


class TestKSTest:
    def test_identical_samples_zero(self, spark):
        from polars_net_spark.operators.regression import ks_test

        rows = [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)]
        d = spark.createDataFrame(rows, ["g", "v"])
        (dd, z, na, nb), = ks_test(d, "g", "v", "a", "b").collect().rows()
        assert dd == 0.0 and z == 0.0 and na == 10 and nb == 10

    def test_disjoint_supports_one(self, spark):
        from polars_net_spark.operators.regression import ks_test

        rows = [("a", float(v)) for v in range(5)] + [("b", float(v) + 100) for v in range(5)]
        d = spark.createDataFrame(rows, ["g", "v"])
        (dd, z, na, nb), = ks_test(d, "g", "v", "a", "b").collect().rows()
        assert dd == 1.0
        assert z == round((5 * 5 / 10) ** 0.5, 6)

    def test_known_small_case(self, spark):
        from polars_net_spark.operators.regression import ks_test

        # a = {1,2,3,4}, b = {3,4,5,6}: max gap at v=2 -> |2/4 - 0/4| = 0.5
        rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [("b", v) for v in [3.0, 4.0, 5.0, 6.0]]
        d = spark.createDataFrame(rows, ["g", "v"])
        (dd, _, _, _), = ks_test(d, "g", "v", "a", "b").collect().rows()
        assert dd == 0.5

    def test_empty_group_null(self, spark):
        from polars_net_spark.operators.regression import ks_test

        d = spark.createDataFrame([("a", 1.0)], ["g", "v"])
        (dd, z, na, nb), = ks_test(d, "g", "v", "a", "b").collect().rows()
        assert nb == 0 and z is None


class TestGini:
    def test_uniform_zero(self, spark):
        from polars_net_spark.operators.analytics import gini_coefficient

        d = spark.createDataFrame([(5.0,)] * 8, ["x"])
        (g, n), = gini_coefficient(d, "x").collect().rows()
        assert g == 0.0 and n == 8

    def test_total_concentration(self, spark):
        from polars_net_spark.operators.analytics import gini_coefficient

        # one holder of everything among n=4 -> G = (n-1)/n = 0.75
        d = spark.createDataFrame([(0.0,), (0.0,), (0.0,), (100.0,)], ["x"])
        (g, n), = gini_coefficient(d, "x").collect().rows()
        assert g == 0.75

    def test_known_value_and_tie_invariance(self, spark):
        from polars_net_spark.operators.analytics import gini_coefficient

        # [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
        d = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], ["x"])
        (g, _), = gini_coefficient(d, "x").collect().rows()
        assert g == 0.25
        # with duplicated values the run-length closed form must equal the
        # row_number definition: [1,1,2,2] -> 2*(1+2+6+8)/(4*6) - 5/4
        d2 = spark.createDataFrame([(1.0,), (1.0,), (2.0,), (2.0,)], ["x"])
        (g2, _), = gini_coefficient(d2, "x").collect().rows()
        assert g2 == round(2 * (1 + 2 + 6 + 8) / (4 * 6) - 5 / 4, 6)

    def test_zero_total_null(self, spark):
        from polars_net_spark.operators.analytics import gini_coefficient

        d = spark.createDataFrame([(0.0,), (0.0,)], ["x"])
        (g, n), = gini_coefficient(d, "x").collect().rows()
        assert g is None and n == 2

    def test_per_key(self, spark):
        from polars_net_spark.operators.analytics import gini_coefficient

        rows = [("k1", 1.0), ("k1", 2.0), ("k1", 3.0), ("k1", 4.0), ("k2", 7.0)]
        d = spark.createDataFrame(rows, ["k", "x"])
        got = {r[0]: r[1] for r in gini_coefficient(d, "x", by="k").collect().rows()}
        assert got["k1"] == 0.25 and got["k2"] == 0.0


class TestBenford:
    def test_digit_extraction_across_decades(self, spark):
        from polars_net_spark.operators.analytics import benford_report

        vals = [1.0, 9.0, 10.0, 99.0, 100.0, 0.02, 0.5, -30.0, 7000.0]
        d = spark.createDataFrame([(v,) for v in vals], ["x"])
        rows = benford_report(d, "x").collect().rows()
        got = {r[0]: r[1] for r in rows}
        # digits: 1,9,1,9,1,2,5,3,7
        assert got[1] == 3 and got[9] == 2 and got[2] == 1
        assert got[5] == 1 and got[3] == 1 and got[7] == 1
        assert len(rows) == 9  # all digits materialized
        assert got[4] == 0 and got[8] == 0

    def test_zeros_and_nulls_excluded(self, spark):
        from polars_net_spark.operators.analytics import benford_report

        d = spark.createDataFrame([(0.0,), (None,), (20.0,)], "x: double")
        rows = benford_report(d, "x").collect().rows()
        total = sum(r[1] for r in rows)
        assert total == 1

    def test_expected_shares(self, spark):
        import math

        from polars_net_spark.operators.analytics import benford_report

        d = spark.createDataFrame([(1.0,)], ["x"])
        rows = benford_report(d, "x").collect().rows()
        for digit, _, _, p_exp, _ in rows:
            assert p_exp == round(math.log10(1 + 1 / digit), 6)


class TestWithScaled:
    def test_zscore_global(self, spark):
        from polars_net_spark.operators.analytics import with_scaled

        d = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["x"])
        rows = sorted(r[1] for r in with_scaled(d, ["x"], round_to=6).collect().rows())
        sd = (2.0 / 3) ** 0.5  # population std of [1,2,3]
        assert rows == [round(v, 6) for v in (-1 / sd, 0.0, 1 / sd)]

    def test_minmax_and_constant_null(self, spark):
        from polars_net_spark.operators.analytics import with_scaled

        d = spark.createDataFrame([(0.0, 7.0), (5.0, 7.0), (10.0, 7.0)], ["a", "b"])
        rows = with_scaled(d, ["a", "b"], method="minmax").collect().rows()
        got = sorted((r[2], r[3]) for r in rows)
        assert got == [(0.0, None), (0.5, None), (1.0, None)]

    def test_robust_per_key(self, spark):
        from polars_net_spark.operators.analytics import with_scaled

        vals = [("k", float(v)) for v in [1, 2, 3, 4, 5]]
        d = spark.createDataFrame(vals, ["k", "x"])
        rows = with_scaled(d, ["x"], method="robust", by="k").collect().rows()
        got = sorted(r[2] for r in rows)
        # median 3, IQR 2 -> (x-3)/2
        assert got == [-1.0, -0.5, 0.0, 0.5, 1.0]

    def test_bad_method_raises(self, spark):
        import pytest as _pytest

        from polars_net_spark.operators.analytics import with_scaled

        d = spark.createDataFrame([(1.0,)], ["x"])
        with _pytest.raises(ValueError):
            with_scaled(d, ["x"], method="log")


class TestLDiversity:
    def test_report(self, spark):
        from polars_net_spark.operators.analytics import l_diversity_report

        rows = [
            ("a", "flu"), ("a", "flu"), ("a", "cold"),   # group a: 2 distinct
            ("b", "flu"), ("b", "flu"),                   # group b: 1 distinct
        ]
        d = spark.createDataFrame(rows, ["q", "s"])
        (ml, ng, nvg, nr), = l_diversity_report(d, ["q"], "s", l=2).collect().rows()
        assert (ml, ng, nvg, nr) == (1, 2, 1, 5)

    def test_null_sensitive_counts_distinct(self, spark):
        from polars_net_spark.operators.analytics import l_diversity_report

        d = spark.createDataFrame([("a", "x"), ("a", None)], ["q", "s"])
        (ml, _, nvg, _), = l_diversity_report(d, ["q"], "s", l=2).collect().rows()
        assert ml == 2 and nvg == 0


class TestSurvivalCurve:
    ROWS = [(1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1), (4.0, 0)]

    def test_global_known_curve(self, spark):
        from polars_net_spark.operators.analytics import survival_curve

        d = spark.createDataFrame(self.ROWS, ["t_obs", "event"])
        got = {r[0]: (r[1], r[2], r[3], r[4]) for r in survival_curve(d, "t_obs", "event").collect().rows()}
        assert got[1.0] == (5, 1, 0, 0.8)
        assert got[2.0] == (4, 0, 1, 0.8)
        assert got[3.0] == (3, 2, 0, round(0.8 / 3, 6))
        assert got[4.0] == (1, 0, 1, round(0.8 / 3, 6))

    def test_per_key_matches_global(self, spark):
        from polars_net_spark.operators.analytics import survival_curve

        rows = [("a", *r) for r in self.ROWS] + [("b", *r) for r in self.ROWS]
        d = spark.createDataFrame(rows, ["k", "t_obs", "event"])
        out = survival_curve(d, "t_obs", "event", by="k").collect().rows()
        assert len(out) == 8
        for k, t, n_risk, dd, c, s in out:
            if t == 3.0:
                assert (n_risk, dd, s) == (3, 2, round(0.8 / 3, 6))

    def test_survival_hits_zero(self, spark):
        from polars_net_spark.operators.analytics import survival_curve

        d = spark.createDataFrame([(5.0, 1)], ["t_obs", "event"])
        (t, n_risk, dd, c, s), = survival_curve(d, "t_obs", "event").collect().rows()
        assert (n_risk, dd, s) == (1, 1, 0.0)


class TestTimeWeightedAverage:
    def test_trapezoid_vs_step(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import time_weighted_average

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("u", base, 0.0),
            ("u", base + dt.timedelta(seconds=10), 10.0),
        ]
        d = spark.createDataFrame(rows, ["k", "ts", "v"])
        (k, twa, t0, t1, n), = time_weighted_average(d, "ts", "v", by="k").collect().rows()
        assert twa == 5.0 and n == 2
        (k, twa_s, *_), = time_weighted_average(d, "ts", "v", by="k", method="step").collect().rows()
        assert twa_s == 0.0

    def test_burst_not_overweighted(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import time_weighted_average

        base = dt.datetime(2024, 1, 1)
        # value 0 for 100s, then a burst of three 10.0 samples in 2s
        rows = [("u", base, 0.0), ("u", base + dt.timedelta(seconds=100), 10.0),
                ("u", base + dt.timedelta(seconds=101), 10.0), ("u", base + dt.timedelta(seconds=102), 10.0)]
        d = spark.createDataFrame(rows, ["k", "ts", "v"])
        (k, twa, *_), = time_weighted_average(d, "ts", "v", by="k").collect().rows()
        # naive mean = 7.5; TWA = (100*5 + 2*10)/102
        assert twa == round((100 * 5 + 2 * 10) / 102, 6)

    def test_single_sample_identity(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import time_weighted_average

        d = spark.createDataFrame([("u", dt.datetime(2024, 1, 1), 7.0)], ["k", "ts", "v"])
        (k, twa, t0, t1, n), = time_weighted_average(d, "ts", "v", by="k").collect().rows()
        assert twa == 7.0 and n == 1


class TestLiftTable:
    def test_two_bins_known(self, spark):
        from polars_net_spark.llm import lift_table

        d = spark.createDataFrame(
            [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], ["s", "y"]
        )
        rows = {r[0]: r[1:] for r in lift_table(d, "s", "y", n_bins=2).collect().rows()}
        n, n_pos, pr, lift, cg, cl = rows[1]
        assert (n, n_pos, pr, lift) == (2, 2, 1.0, 2.0)
        assert (cg, cl) == (1.0, 2.0)
        n, n_pos, pr, lift, cg, cl = rows[2]
        assert (n, n_pos, pr, lift) == (2, 0, 0.0, 0.0)
        assert (cg, cl) == (1.0, 1.0)

    def test_empty_bin_materialized(self, spark):
        from polars_net_spark.llm import lift_table

        # all scores equal: every row lands in the BOTTOM decile bucket
        d = spark.createDataFrame([(5.0, 1)] * 4, ["s", "y"])
        rows = lift_table(d, "s", "y", n_bins=4).collect().rows()
        assert len(rows) == 4
        by_d = {r[0]: r[1] for r in rows}
        assert sum(by_d.values()) == 4

    def test_bad_bins_raise(self, spark):
        import pytest as _pytest

        from polars_net_spark.llm import lift_table

        d = spark.createDataFrame([(1.0, 1)], ["s", "y"])
        with _pytest.raises(ValueError):
            lift_table(d, "s", "y", n_bins=1)
