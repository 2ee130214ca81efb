"""Round-8 batch 5: split_leakage_safe (llm/splits.py) and
strip_boilerplate_lines (llm/dedup.py)."""

import pytest

from polars_net_spark.llm.dedup import strip_boilerplate_lines
from polars_net_spark.llm.splits import split_by_hash, split_leakage_safe


def rows(lf):
    return lf.collect().rows()


class TestLeakageSafeSplit:
    def test_exact_dups_land_together(self, spark):
        # 50 distinct texts, each duplicated 4x with different ids and
        # cosmetic whitespace/case variation
        data = []
        for i in range(50):
            t = f"Document number {i} with shared content"
            variants = [t, t.upper(), "  " + t + "  ", t.replace(" ", "  ")]
            for j, v in enumerate(variants):
                data.append((i * 10 + j, v))
        d = spark.createDataFrame(data, "doc_id long, text string").repartition(7)
        out = split_leakage_safe(d, weights={"train": 0.7, "test": 0.3}, salt="s")
        got = out.spark.groupBy("split_group").agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count_distinct("split").alias("k")
        ).collect()
        assert all(r["k"] == 1 for r in got)
        assert len(got) == 50  # normalization collapsed the variants

    def test_row_keyed_split_would_leak(self, spark):
        # sanity: on the same data, id-keyed split DOES straddle groups
        from pyspark.sql import functions as F

        data = []
        for i in range(50):
            t = f"Document number {i} with shared content"
            for j in range(4):
                data.append((i * 10 + j, t))
        d = spark.createDataFrame(data, "doc_id long, text string")
        leaky = split_by_hash(d, "doc_id", weights={"train": 0.7, "test": 0.3}, salt="s")
        k = (
            leaky.spark.groupBy("text")
            .agg(F.count_distinct("split").alias("k"))
            .agg(F.max("k"))
            .collect()[0][0]
        )
        assert k > 1

    def test_cluster_col_override(self, spark):
        d = spark.createDataFrame(
            [(1, "a", 100), (2, "b", 100), (3, "c", 200)],
            "doc_id long, text string, cl long",
        )
        out = split_leakage_safe(d, cluster_col="cl").spark.collect()
        by_cl = {}
        for r in out:
            by_cl.setdefault(r["cl"], set()).add(r["split"])
        assert all(len(v) == 1 for v in by_cl.values())

    def test_deterministic_and_weights(self, spark):
        d = spark.createDataFrame(
            [(i, f"text {i}") for i in range(1000)], "doc_id long, text string"
        )
        a = {r["doc_id"]: r["split"] for r in split_leakage_safe(d, salt="x").spark.collect()}
        b = {r["doc_id"]: r["split"] for r in split_leakage_safe(d, salt="x").spark.collect()}
        assert a == b
        from collections import Counter

        c = Counter(a.values())
        assert c["train"] > 800 and 10 <= c["val"] + c["test"] <= 190


class TestStripBoilerplate:
    def test_frequent_line_removed_everywhere(self, spark):
        footer = "(c) 2026 Example Corp"
        docs = [
            (i, f"unique body {i}\n{footer}\nmore text {i}") for i in range(10)
        ] + [(100, "no footer here")]
        d = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
        out = {r[0]: r for r in rows(strip_boilerplate_lines(d, max_df_share=0.5))}
        for i in range(10):
            assert footer not in out[i][1]
            assert out[i][1] == f"unique body {i}\nmore text {i}"
            assert out[i][2] == 3 and out[i][3] == 2
        assert out[100][1] == "no footer here"

    def test_unlike_dedup_lines_all_copies_drop(self, spark):
        # dedup_lines keeps the FIRST occurrence; this drops all of them
        d = spark.createDataFrame(
            [(1, "common\nalpha"), (2, "common\nbeta"), (3, "common\ngamma")],
            "doc_id long, text string",
        )
        out = {r[0]: r[1] for r in rows(strip_boilerplate_lines(d, max_df_share=0.5))}
        assert out == {1: "alpha", 2: "beta", 3: "gamma"}

    def test_min_df_guards_small_corpora(self, spark):
        # 1 of 2 docs -> 50% share, but df=1 < min_df=2 keeps it
        d = spark.createDataFrame(
            [(1, "rare line\nbody"), (2, "body two")], "doc_id long, text string"
        )
        out = {r[0]: r[1] for r in rows(strip_boilerplate_lines(d, max_df_share=0.3))}
        assert out[1] == "rare line\nbody"

    def test_by_segment_scoping(self, spark):
        # the banner saturates site A (3/3 docs) but only 1/3 of site B
        data = [
            (1, "A", "banner\na1"), (2, "A", "banner\na2"), (3, "A", "banner\na3"),
            (4, "B", "banner\nb1"), (5, "B", "b2"), (6, "B", "b3"),
        ]
        d = spark.createDataFrame(data, "doc_id long, source string, text string")
        out = {r[0]: r for r in rows(
            strip_boilerplate_lines(d, by="source", max_df_share=0.5)
        )}
        assert out[1][2] == "a1" and out[2][2] == "a2"   # stripped in A
        assert out[4][2] == "banner\nb1"                  # kept in B
        assert out[1][1] == "A" and out[4][1] == "B"

    def test_normalization_and_repeat_counts_once(self, spark):
        # doc 1 repeats the banner twice -> still df=2 of 4 docs (50%)
        data = [
            (1, "Banner\n  banner  \nx1"), (2, "BANNER\nx2"),
            (3, "x3"), (4, "x4"),
        ]
        d = spark.createDataFrame(data, "doc_id long, text string")
        out = {r[0]: r[1] for r in rows(strip_boilerplate_lines(d, max_df_share=0.4))}
        assert out[1] == "x1" and out[2] == "x2"

    def test_null_and_empty_text(self, spark):
        d = spark.createDataFrame(
            [(1, None), (2, ""), (3, "a\nb")], "doc_id long, text string"
        )
        out = {r[0]: r for r in rows(strip_boilerplate_lines(d, max_df_share=0.9))}
        assert out[1][1] == "" and out[1][2] == 1
        assert out[3][1] == "a\nb"

    def test_bad_share_raises(self, spark):
        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            strip_boilerplate_lines(d, max_df_share=0.0)


class TestFertility:
    def test_known_counts(self, spark):
        from polars_net_spark.llm.text import fertility_report

        # "hello world" -> 2 words, 2 tokens; "a1-b2" -> 1 word, 6 tokens
        # (a,1,-,b,2) wait: [A-Za-z]+ -> 'a','b'; [0-9] -> '1','2'; punct '-'
        d = spark.createDataFrame(
            [("hello world",), ("a1-b2",), (None,)], "text string"
        )
        (nd, nw, nt, fert, cpt), = fertility_report(d).collect().rows()
        assert nd == 2 and nw == 3 and nt == 2 + 5
        assert abs(fert - 7 / 3) < 1e-6
        assert abs(cpt - (11 + 5) / 7) < 1e-6

    def test_by_segments(self, spark):
        from polars_net_spark.llm.text import fertility_report

        d = spark.createDataFrame(
            [("a", "one two"), ("b", "x-1")], "g string, text string"
        )
        out = {r[0]: r for r in fertility_report(d, by="g").collect().rows()}
        assert out["a"][2] == 2 and out["a"][3] == 2  # words, tokens
        assert out["b"][2] == 1 and out["b"][3] == 3


class TestStripMarkup:
    def test_basic_strip(self, spark):
        from polars_net_spark.llm.text import strip_markup_frame

        d = spark.createDataFrame(
            [(1, '<html><body><p>Hello <b>world</b></p>'
                 '<script>var x=1;</script><!-- hidden -->'
                 '&amp; more &lt;stuff&gt;</body></html>'),
             (2, 'plain text'),
             (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in strip_markup_frame(d).spark.collect()}
        assert out[1]["clean_text"] == "Hello world & more <stuff>"
        assert out[1]["n_tags"] > 5
        assert out[2]["clean_text"] == "plain text" and out[2]["n_tags"] == 0
        assert out[3]["clean_text"] == ""

    def test_unclosed_script_eats_tail(self, spark):
        from polars_net_spark.llm.text import strip_markup_frame

        d = spark.createDataFrame(
            [(1, 'keep <script>never() closed')], "doc_id long, text string"
        )
        (r,) = strip_markup_frame(d).spark.collect()
        assert r["clean_text"] == "keep"

    def test_style_and_nbsp(self, spark):
        from polars_net_spark.llm.text import strip_markup_frame

        d = spark.createDataFrame(
            [(1, 'a<style>p{color:red}</style>b&nbsp;c')],
            "doc_id long, text string",
        )
        (r,) = strip_markup_frame(d).spark.collect()
        assert r["clean_text"] == "a b c"


class TestScriptDetect:
    def test_dominant_scripts(self, spark):
        from polars_net_spark.llm.text import script_detect_frame

        d = spark.createDataFrame(
            [(1, "hello world"), (2, "Привет мир"), (3, "你好世界"),
             (4, "12345"), (5, "!!!"), (6, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in script_detect_frame(d).spark.collect()}
        assert out[1]["dominant"] == "latin" and out[1]["share_latin"] == 1.0
        assert out[2]["dominant"] == "cyrillic"
        assert out[3]["dominant"] == "cjk"
        assert out[4]["dominant"] == "digit"
        assert out[5]["dominant"] == "unknown"
        assert out[6]["dominant"] == "unknown" and out[6]["n_chars"] == 0

    def test_mixed_shares_and_tiebreak(self, spark):
        from polars_net_spark.llm.text import script_detect_frame

        d = spark.createDataFrame(
            [(1, "abcd Привет"), (2, "ab12")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in script_detect_frame(d).spark.collect()}
        assert abs(out[1]["share_latin"] - 4 / 10) < 1e-9
        assert abs(out[1]["share_cyrillic"] - 6 / 10) < 1e-9
        assert out[1]["dominant"] == "cyrillic"
        # exact 50/50 latin vs digit -> name-ascending tie-break = digit
        assert out[2]["dominant"] == "digit"


class TestReviewFixes:
    def test_blank_lines_never_boilerplate(self, spark):
        from polars_net_spark.llm.dedup import strip_boilerplate_lines

        d = spark.createDataFrame(
            [(1, "intro\n\nbody one"), (2, "start\n\nbody two"),
             (3, "top\n\nbody three")],
            "doc_id long, text string",
        )
        out = {r[0]: r[1] for r in
               strip_boilerplate_lines(d, max_df_share=0.3).collect().rows()}
        # every doc keeps its paragraph separator
        assert out[1] == "intro\n\nbody one"

    def test_amp_decodes_last(self, spark):
        from polars_net_spark.llm.text import strip_markup_frame

        # '&amp;lt;b&amp;gt;' renders as the literal text '&lt;b&gt;';
        # decoding &amp; first would fabricate a '<b>' tag
        d = spark.createDataFrame(
            [(1, "use &amp;lt;b&amp;gt; here")], "doc_id long, text string"
        )
        (r,) = strip_markup_frame(d).spark.collect()
        assert r["clean_text"] == "use &lt;b&gt; here"
