"""Property-based tests (hypothesis) — beyond the reference's example-only
strategy (SURVEY §5: no property tests there).  Kept small: each example costs
a Spark job, so max_examples is low and frames are tiny."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import polars_net_spark as pl
from polars_net_spark import col

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        st.text(alphabet="abc ", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=8,
)


@settings(**SETTINGS)
@given(rows=rows_strategy)
def test_parquet_roundtrip_identity(spark, tmp_path_factory, rows):
    df = pl.from_records(rows, "i long, f double, s string")
    path = str(tmp_path_factory.mktemp("pq") / "t")
    df.write_parquet(path)
    back = pl.read_parquet(path, spark=spark)
    assert sorted(back.rows(), key=str) == sorted(df.rows(), key=str)


@settings(**SETTINGS)
@given(rows=rows_strategy, threshold=st.integers(min_value=-1000, max_value=1000))
def test_filter_partition_complement(spark, rows, threshold):
    df = pl.from_records(rows, "i long, f double, s string")
    p = col("i") > threshold
    assert df.filter(p).height + df.filter(~p).height == df.height


@settings(**SETTINGS)
@given(rows=rows_strategy)
def test_concat_vertical_heights(spark, rows):
    df = pl.from_records(rows, "i long, f double, s string")
    both = pl.concat([df.lazy(), df.lazy()], how="vertical").collect()
    assert both.height == 2 * df.height


@settings(**SETTINGS)
@given(rows=rows_strategy, n=st.integers(min_value=0, max_value=12))
def test_head_bound(spark, rows, n):
    df = pl.from_records(rows, "i long, f double, s string")
    assert df.head(n).height == min(n, df.height)


@settings(**SETTINGS)
@given(rows=rows_strategy)
def test_sort_is_idempotent_and_permutation(spark, rows):
    df = pl.from_records(rows, "i long, f double, s string")
    once = df.sort(["i", "s"]).rows()
    twice = df.sort(["i", "s"]).sort(["i", "s"]).rows()
    assert once == twice
    assert sorted(once, key=str) == sorted(df.rows(), key=str)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="xyz ", min_size=5, max_size=30), min_size=2, max_size=6
    )
)
def test_jaccard_threshold_monotone(spark, texts):
    docs = pl.from_records(list(enumerate(texts)), "doc_id long, text string")
    from polars_net_spark.llm import ngram_jaccard_pairs

    low = {(a, b) for a, b, _ in ngram_jaccard_pairs(docs.lazy(), n=2, threshold=0.3).collect().rows()}
    high = {(a, b) for a, b, _ in ngram_jaccard_pairs(docs.lazy(), n=2, threshold=0.7).collect().rows()}
    assert high <= low  # raising the threshold can only remove pairs


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="pq ", min_size=0, max_size=15), min_size=1, max_size=6
    )
)
def test_dedup_exact_idempotent(spark, texts):
    docs = pl.from_records(list(enumerate(texts)), "doc_id long, text string")
    from polars_net_spark.llm import dedup_exact

    once = dedup_exact(docs.lazy()).collect()
    twice = dedup_exact(once.lazy()).collect()
    assert once.height == twice.height <= docs.height
