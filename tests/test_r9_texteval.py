"""Round-9: corpus BLEU and ROUGE-N."""
import math

import pytest

from polars_net_spark.llm.evaluation import bleu_corpus, rouge_n


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestBleu:
    def test_identical_is_one(self, spark):
        d = spark.createDataFrame(
            [(1, "the cat sat on the mat today", "the cat sat on the mat today")],
            "id int, hyp string, ref string",
        )
        (r,) = rows(bleu_corpus(d, "hyp", "ref", "id"))
        assert r[0] == 1.0 and r[1] == 1.0 and r[2:6] == (1.0, 1.0, 1.0, 1.0)

    def test_clipping(self, spark):
        # Papineni's degenerate example: p1 clipped at ref count
        d = spark.createDataFrame(
            [(1, "the the the the the the the",
              "the cat is on the mat wow")],
            "id int, hyp string, ref string",
        )
        (r,) = rows(bleu_corpus(d, "hyp", "ref", "id", max_n=1))
        assert abs(r[2] - 2 / 7) < 1e-6  # 'the' appears twice in ref
        assert r[0] == round(2 / 7, 6)  # BP=1 (equal lengths)

    def test_brevity_penalty(self, spark):
        d = spark.createDataFrame(
            [(1, "a b c d", "a b c d e")], "id int, hyp string, ref string"
        )
        (r,) = rows(bleu_corpus(d, "hyp", "ref", "id", max_n=2))
        assert abs(r[1] - math.exp(1 - 5 / 4)) < 1e-6

    def test_corpus_pooling(self, spark):
        # corpus-level p_n pools counts across docs (not mean of per-doc)
        d = spark.createDataFrame(
            [(1, "x y", "x y"), (2, "a a a a", "a b c d")],
            "id int, hyp string, ref string",
        )
        (r,) = rows(bleu_corpus(d, "hyp", "ref", "id", max_n=1))
        # clipped: doc1 2/2, doc2 min(4,1)=1 -> p1 = 3/6
        assert abs(r[2] - 0.5) < 1e-6

    def test_zero_ngram_order_is_bleu_zero(self, spark):
        d = spark.createDataFrame(
            [(1, "a b c d", "w x y z")], "id int, hyp string, ref string"
        )
        (r,) = rows(bleu_corpus(d, "hyp", "ref", "id"))
        assert r[0] == 0.0

    def test_validation(self, spark):
        d = spark.createDataFrame([(1, "a", "a")], "id int, hyp string, ref string")
        with pytest.raises(ValueError, match="no 2-grams"):
            bleu_corpus(d, "hyp", "ref", "id", max_n=2)


class TestRouge:
    def test_recall_oriented(self, spark):
        # hyp covers 3 of ref's 5 bigrams
        d = spark.createDataFrame(
            [(1, "the cat sat on", "the cat sat on the mat")],
            "id int, hyp string, ref string",
        )
        (n, nd, mr, mar, mp, mf), = rows(rouge_n(d, "hyp", "ref", "id", n=2))
        assert n == 2 and nd == 1 and abs(mr - 3 / 5) < 1e-6 and mp == 1.0

    def test_micro_vs_macro(self, spark):
        d = spark.createDataFrame(
            [(1, "a b", "a b"),          # recall 1/1
             (2, "x", "c d e f g h")],   # recall 0/5
            "id int, hyp string, ref string",
        )
        (n, nd, mr, mar, mp, mf), = rows(rouge_n(d, "hyp", "ref", "id", n=2))
        assert abs(mr - 1 / 6) < 1e-6      # pooled 1/(1+5)
        assert abs(mar - 0.5) < 1e-6       # mean(1, 0)
        assert nd == 2

    def test_validation(self, spark):
        d = spark.createDataFrame([(1, "a b", "c")], "id int, hyp string, ref string")
        with pytest.raises(ValueError, match="no 2-grams"):
            rouge_n(d, "hyp", "ref", "id", n=2)
