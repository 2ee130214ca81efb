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


# --- round-2 operators -------------------------------------------------------

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.text(alphabet="ab X.#\n-", min_size=0, max_size=40),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(**SETTINGS)
@given(rows=docs_strategy)
def test_chunking_reconstructs_tokens(spark, rows):
    """Concatenating chunk tokens (dropping each chunk's overlap prefix after
    the first) must reproduce the document's token stream exactly."""
    from polars_net_spark.llm import chunk_documents

    df = pl.from_records(rows, "doc_id long, text string")
    out = chunk_documents(df.lazy(), size=5, overlap=2).collect().rows()
    per_doc = {}
    for doc_id, chunk_id, _, chunk in sorted(out):
        toks = chunk.split(" ") if chunk else []
        prev = per_doc.setdefault(doc_id, [])
        prev.extend(toks if chunk_id == 0 else toks[2:])
    for doc_id, text in rows:
        expect = [w for w in text.split() if w]
        assert per_doc.get(doc_id, []) == expect


@settings(**SETTINGS)
@given(rows=docs_strategy)
def test_gopher_metrics_bounded(spark, rows):
    """All fraction metrics stay in [0,1]; counts are non-negative; no nulls."""
    from polars_net_spark.llm import gopher_quality_frame

    df = pl.from_records(rows, "doc_id long, text string")
    out = gopher_quality_frame(df.lazy(), min_words=1).collect().rows()
    assert len(out) == len(rows)
    for r in out:
        _, n_words, mwl, sym, bullet, ellipsis, alpha, stops, _ = r
        assert n_words >= 0 and stops >= 0 and mwl >= 0 and sym >= 0
        for frac in (bullet, ellipsis, alpha):
            assert 0.0 <= frac <= 1.0


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=10,
    ),
    buckets=st.integers(min_value=1, max_value=4),
)
def test_salted_join_always_matches_plain(spark, rows, buckets):
    from polars_net_spark.operators.joins_ext import salted_join

    left = pl.from_records(rows, "k long, v long").lazy()
    right = pl.from_records(
        [(k, f"n{k}") for k in {r[0] for r in rows} if k % 2 == 0] or [(999, "x")],
        "k long, name string",
    ).lazy()
    for how in ("inner", "left"):
        plain = sorted(left.join(right, on="k", how=how).collect().rows(), key=str)
        salted = sorted(
            salted_join(left, right, on="k", buckets=buckets, how=how).collect().rows(),
            key=str,
        )
        assert salted == plain


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_split_partitions_every_row_exactly_once(spark, rows):
    from polars_net_spark.llm import split_by_hash

    df = pl.from_records(rows, "doc_id long").lazy()
    out = split_by_hash(df, "doc_id").collect().rows()
    assert len(out) == len(rows)
    assert all(r[1] in ("train", "val", "test") for r in out)


@settings(**SETTINGS)
@given(
    a=st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=8),
    b=st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=8),
)
def test_merge_sorted_properties(spark, a, b):
    """merge_sorted output is sorted by key and is the exact multiset union."""
    if not a and not b:
        return
    la = pl.from_records([(v, "a") for v in sorted(a)] or [(0, "a")], ["k", "src"]).lazy()
    lb = pl.from_records([(v, "b") for v in sorted(b)] or [(0, "b")], ["k", "src"]).lazy()
    la = la if a else la.filter(col("k") > 10**9)
    lb = lb if b else lb.filter(col("k") > 10**9)
    out = la.merge_sorted(lb, "k").collect().rows()
    keys = [r[0] for r in out]
    assert keys == sorted(keys)
    assert sorted(keys) == sorted(sorted(a) + sorted(b))


@settings(**SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=5),
    offset=st.integers(min_value=0, max_value=4),
    size=st.integers(min_value=0, max_value=20),
)
def test_gather_every_count_formula(spark, n, offset, size):
    if size == 0:
        return
    d = pl.from_records([(i,) for i in range(size)], ["x"]).lazy()
    got = [r[0] for r in d.gather_every(n, offset).collect().rows()]
    assert sorted(got) == list(range(offset, size, n))


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.booleans() | st.none(), min_size=0, max_size=6
    )
)
def test_any_all_match_python(spark, vals):
    """Expr.any/all (ignore_nulls=True) agree with Python any/all over the
    non-null values."""
    sdf = pl.get_spark().createDataFrame(
        [("k", v) for v in vals] or [("k", None)], "k string, v boolean"
    )
    row = (
        pl.LazyFrame(sdf).group_by("k")
        .agg(col("v").any().alias("a"), col("v").all().alias("l"))
        .collect().rows()[0]
    )
    nn = [v for v in vals if v is not None]
    assert row[1] == any(nn)
    assert row[2] == all(nn)


@settings(**SETTINGS)
@given(
    hashes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2, max_size=8, unique=True,
    ),
    k=st.integers(min_value=0, max_value=7),
)
def test_banded_hamming_total_recall_under_bands(spark, hashes, k):
    """banded_hamming_pairs with max_hamming < bands equals brute force
    EXACTLY (pigeonhole guarantee) on arbitrary 64-bit fingerprints."""
    from polars_net_spark.llm import banded_hamming_pairs

    sdf = pl.get_spark().createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id long, h long"
    )
    got = sorted(
        banded_hamming_pairs(sdf, "h", "id", max_hamming=k, bands=8).collect().rows()
    )
    mask = (1 << 64) - 1
    truth = sorted(
        (a, b, bin((hashes[a] ^ hashes[b]) & mask).count("1"))
        for a in range(len(hashes))
        for b in range(a + 1, len(hashes))
        if bin((hashes[a] ^ hashes[b]) & mask).count("1") <= k
    )
    assert got == truth


@settings(**SETTINGS)
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 1), st.floats(min_value=-100, max_value=100, allow_nan=False)),
        min_size=1, max_size=8,
    )
)
def test_preference_pairs_match_python(spark, scores):
    """best_worst chosen/rejected equal the Python argmax/argmin under the
    (score, id) tie-break."""
    from polars_net_spark.llm import preference_pairs

    rows = [(g, i, f"r{i}", s) for i, (g, s) in enumerate(scores)]
    d = pl.get_spark().createDataFrame(rows, "g int, i int, t string, s double")
    out = {r[0]: (r[1], r[2]) for r in preference_pairs(
        d, group_col="g", response_col="t", score_col="s", id_col="i"
    ).collect().rows()}
    from collections import defaultdict
    groups = defaultdict(list)
    for g, i, t, s in rows:
        groups[g].append((s, i))
    for g, members in groups.items():
        hi = max(members)
        lo = min(members)
        if hi[1] == lo[1]:
            assert g not in out  # single-element group dropped
        else:
            assert out[g] == (hi[1], lo[1])


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.floats(min_value=-50, max_value=50, allow_nan=False)),
        min_size=1, max_size=10,
    )
)
def test_sort_by_first_last_match_python(spark, vals):
    """sort_by(t).first()/.last() equal Python min/max-by-key."""
    rows = [(g, i, v) for i, (g, v) in enumerate(vals)]
    d = pl.get_spark().createDataFrame(rows, "g int, t int, v double")
    out = {
        r[0]: (r[1], r[2])
        for r in pl.LazyFrame(d).group_by("g").agg(
            col("v").sort_by("t").first().alias("f"),
            col("v").sort_by("t").last().alias("l"),
        ).collect().rows()
    }
    from collections import defaultdict
    groups = defaultdict(list)
    for g, t, v in rows:
        groups[g].append((t, v))
    for g, members in groups.items():
        assert out[g] == (min(members)[1], max(members)[1])
