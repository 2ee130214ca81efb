"""Deterministic hash-based dataset splitting."""

import hashlib

import polars_net_spark as pl
from polars_net_spark.llm import kfold_by_hash, split_by_hash
from polars_net_spark.llm.splits import _BUCKETS


def docs(spark, n=400):
    return pl.from_records([(i, f"doc {i}") for i in range(n)], ["doc_id", "text"]).lazy()


def _py_bucket(key, salt=""):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:8], 16) % _BUCKETS


def test_split_matches_python_reference(spark):
    out = split_by_hash(docs(spark), "doc_id", salt="s1").collect()
    for doc_id, _, split in out.rows():
        b = _py_bucket(doc_id, "s1")
        exp = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert split == exp


def test_split_proportions_and_stability(spark):
    d = docs(spark, 2000)
    out1 = split_by_hash(d, "doc_id").collect()
    out2 = split_by_hash(d, "doc_id").collect()
    assert sorted(out1.rows()) == sorted(out2.rows())  # run-to-run stable
    counts = {}
    for _, _, s in out1.rows():
        counts[s] = counts.get(s, 0) + 1
    assert 0.85 < counts["train"] / 2000 < 0.95
    assert counts["val"] + counts["test"] < 0.15 * 2000
    # different salt reshuffles membership
    out3 = split_by_hash(d, "doc_id", salt="other").collect()
    assert sorted(out1.rows()) != sorted(out3.rows())


def test_split_is_subset_stable(spark):
    # growing the corpus never changes an existing row's split (no leakage)
    small = {r[0]: r[2] for r in split_by_hash(docs(spark, 100), "doc_id").collect().rows()}
    big = {r[0]: r[2] for r in split_by_hash(docs(spark, 400), "doc_id").collect().rows()}
    for k, v in small.items():
        assert big[k] == v


def test_kfold(spark):
    out = kfold_by_hash(docs(spark, 500), "doc_id", k=5).collect()
    folds = [r[2] for r in out.rows()]
    assert set(folds) == {0, 1, 2, 3, 4}
    for doc_id, _, fold in out.rows():
        assert fold == _py_bucket(doc_id) % 5


def test_split_validates_weights(spark):
    try:
        split_by_hash(docs(spark), "doc_id", weights={"a": 0.5, "b": 0.4})
        assert False
    except ValueError:
        pass
