"""Record linkage (blocked Jaro-Winkler), Aho-Corasick keyword tagging,
run-length loop detection, and containment near-dup.

The scorers' exact twins are fuzz-pinned here against their references
(DuckDB ``jaro_winkler_similarity``; Python ``str.count``) so the DuckDB
oracles in ``__spark_entry__`` can hash-check the full operators.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.functions.keywords import (
    build_automaton,
    count_keywords,
    keyword_hits,
    keyword_profile,
)
from png_from_pdf_extracter_spark.functions.linkage import (
    jaro_winkler_py,
    jw_blocked_linkage,
    linkage_canonicalize,
)
from png_from_pdf_extracter_spark.operators.sessions import label_runs


# ---------------------------------------------------------------- jaro

def test_jaro_winkler_matches_duckdb_fuzz():
    rng = random.Random(7)
    pairs = [("", ""), ("", "a"), ("abc", "abc"), ("martha", "marhta")]
    for _ in range(2000):
        a = "".join(rng.choices("abcd ", k=rng.randint(0, 14)))
        b = "".join(rng.choices("abcd ", k=rng.randint(0, 14)))
        pairs.append((a, b))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    duck = [
        r[0]
        for r in con.execute(
            "SELECT jaro_winkler_similarity(a, b) FROM p"
        ).fetchall()
    ]
    for (a, b), d in zip(pairs, duck):
        assert abs(jaro_winkler_py(a, b) - d) < 1e-9, (a, b)


def test_jw_blocked_linkage_finds_typos(spark):
    rows = [
        ("a", "Jonathan Smith"),
        ("b", "Jonathan Smyth"),
        ("c", "jonathan  smith"),  # normalizes to a distinct near-dup
        ("d", "Zebra Unrelated"),
        ("e", "Jon Smith"),  # same block, lower similarity
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = jw_blocked_linkage(df, "name", threshold=0.9).collect()
    got = {(r.name_a, r.name_b) for r in out}
    assert ("jonathan smith", "jonathan smyth") in got
    assert all("zebra" not in a + b for a, b in got)
    for r in out:
        assert r.jw >= 0.9


def test_jw_blocked_linkage_max_block_guard(spark):
    # 6 names in one hot block; cap at 5 drops the whole block
    rows = [(f"x{i}", f"aa name {i}") for i in range(6)] + [
        ("y1", "zz alpha"),
        ("y2", "zz alphb"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = jw_blocked_linkage(df, "name", threshold=0.8, max_block=5)
    names = {r.name_a for r in out.collect()} | {
        r.name_b for r in out.collect()
    }
    assert names and all(n.startswith("zz") for n in names)


def test_linkage_canonicalize_broadcast_mapping(spark):
    rows = [("1", "Acme Corp"), ("2", "acme corp"), ("3", "acme  corp."),
            ("4", "Other Co")]
    df = spark.createDataFrame(rows, ["id", "name"])
    pairs = jw_blocked_linkage(df, "name", threshold=0.9)
    out = linkage_canonicalize(df, "name", pairs)
    got = {r.id: r.canonical_name for r in out.collect()}
    # the two acme variants map to the same canonical form
    assert got["1"] == got["2"] == got["3"]
    assert got["4"] == "other co"
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ keywords

def test_count_keywords_matches_str_count_fuzz():
    rng = random.Random(11)
    kws = ("ab", "aba", "ba", "abab", "c", "bc", "cab", "aa")
    auto = build_automaton(kws)
    for _ in range(2000):
        t = "".join(rng.choices("abc", k=rng.randint(0, 30)))
        assert count_keywords(t, kws, auto) == [t.count(k) for k in kws], t


def test_keyword_hits_long_format(spark):
    df = spark.createDataFrame(
        [("d1", "spark spark and table"), ("d2", "no match here"),
         ("d3", None)],
        ["doc_id", "text"],
    )
    out = keyword_hits(df, "doc_id", "text", ["spark", "table", "zzz"])
    got = {(r.doc_id, r.keyword): r.hits for r in out.collect()}
    assert got == {("d1", "spark"): 2, ("d1", "table"): 1}


def test_keyword_profile_rollup(spark):
    df = spark.createDataFrame(
        [("d1", "x spark y spark"), ("d2", "spark"), ("d3", "none")],
        ["doc_id", "text"],
    )
    out = keyword_profile(df, "doc_id", "text", ["spark"]).collect()
    assert len(out) == 1
    assert (out[0].n_docs, out[0].n_hits) == (2, 3)


def test_keyword_overlapping_keywords_independent(spark):
    # 'abab' contains 'ab' twice (non-overlapping) and 'aba' once —
    # different keywords count independently even when they overlap
    df = spark.createDataFrame([("d", "abab")], ["doc_id", "text"])
    out = keyword_hits(df, "doc_id", "text", ["ab", "aba", "abab"])
    got = {r.keyword: r.hits for r in out.collect()}
    assert got == {"ab": 2, "aba": 1, "abab": 1}


# ----------------------------------------------------------- label_runs

def test_label_runs_detects_loops(spark):
    rows = [
        ("c1", 1, "search"), ("c1", 2, "search"), ("c1", 3, "search"),
        ("c1", 4, "answer"),
        ("c2", 1, "search"), ("c2", 2, "browse"), ("c2", 3, "search"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tool"])
    out = label_runs(df, "conv_id", "tool", ["turn_idx"], min_run=3)
    got = [(r.conv_id, r.tool, r.run_len, r.start_turn_idx, r.end_turn_idx)
           for r in out.collect()]
    assert got == [("c1", "search", 3, 1, 3)]


def test_label_runs_single_exchange(spark):
    df = spark.createDataFrame(
        [("u", i, "a") for i in range(5)], ["k", "o", "lbl"]
    )
    out = label_runs(df, "k", "lbl", ["o"], min_run=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one shuffle for the window + the (k,lbl,island) agg reuses the
    # clustering (hash(k) satisfies the agg's ClusteredDistribution)
    assert plan.count("Exchange") <= 2
    assert out.collect()[0].run_len == 5


def test_label_runs_min_run_boundary(spark):
    df = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "a"), ("u", 3, "b"), ("u", 4, "b"),
         ("u", 5, "b")],
        ["k", "o", "lbl"],
    )
    out = {(r.lbl, r.run_len) for r in
           label_runs(df, "k", "lbl", ["o"], min_run=2).collect()}
    assert out == {("a", 2), ("b", 3)}


# ---------------------------------------------------------- containment

def test_ngram_containment_catches_subset_dup(spark):
    from png_from_pdf_extracter_spark.functions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    snippet = "the quick brown fox jumps over the lazy dog today"
    long_doc = snippet + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [("a", snippet), ("b", long_doc), ("c", "totally different words "
                                               "all around here now")],
        ["doc_id", "text"],
    )
    cont = ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.9)
    got = [(r.id1, r.id2, r.containment) for r in cont.collect()]
    assert got == [("a", "b", 1.0)]
    # Jaccard misses the same pair at any comparable threshold
    jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5)
    assert jac.count() == 0


# ---------------------------------------------------------- turn_churn

def test_turn_churn_flags_paraphrased_repeat(spark):
    from png_from_pdf_extracter_spark.operators.sessions import turn_churn

    rows = [
        ("c1", 1, "please run the search tool now"),
        ("c1", 2, "now please run the search tool"),  # same token set
        ("c1", 3, "completely different answer text here"),
        ("c2", 1, "please run the search tool now"),  # first turn: never
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    out = turn_churn(df, "conv_id", ["turn_idx"], "text", min_jaccard=0.8)
    got = [(r.conv_id, r.turn_idx, r.prev_jaccard) for r in out.collect()]
    assert got == [("c1", 2, 1.0)]


def test_turn_churn_token_set_not_bag(spark):
    from png_from_pdf_extracter_spark.operators.sessions import turn_churn

    rows = [("c", 1, "a a a b"), ("c", 2, "b a")]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    out = turn_churn(df, "conv_id", ["turn_idx"], "text", min_jaccard=0.9)
    r = out.collect()
    assert len(r) == 1 and r[0].prev_jaccard == 1.0 and r[0].n_tokens == 2


# ------------------------------------------------ streaming keyword tag

def test_keyword_hits_works_on_a_stream(spark, tmp_path):
    """keyword_hits is mapInPandas-only — stream-compatible by
    construction; pin it so a future rewrite can't silently add a batch-
    only op (aggregations, windows) to the tagging path."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("d1", "spark x spark"), ("d2", "table"), ("d3", "nothing")],
        ["doc_id", "text"],
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id string, text string").parquet(
        src
    )
    tagged = keyword_hits(stream, "doc_id", "text", ["spark", "table"])
    assert tagged.isStreaming
    q = (
        tagged.writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.keyword): r.hits
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("d1", "spark"): 2, ("d2", "table"): 1}


def test_rake_textbook_scoring(spark):
    from png_from_pdf_extracter_spark.functions.keywords import (
        rake_keyphrases,
    )

    # classic RAKE behavior: multi-word phrases outrank loners because
    # degree rewards co-travel
    rows = [
        (1, "linear diophantine equations and strict inequations"),
        (2, "linear diophantine equations of minimal sets"),
        (3, "strict inequations and minimal sets"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rake_keyphrases(
        df, stopwords=("and", "of"), top_k=10
    ).collect()
    by_phrase = {r["phrase"]: r for r in out}
    assert "linear diophantine equations" in by_phrase
    top = out[0]
    # the 3-word phrase wins: every member word has deg/freq >= 3
    assert top["phrase"] == "linear diophantine equations"
    assert top["n_words"] == 3 and top["occurrences"] == 2
    # python twin of its score: deg/freq quantized per word, summed
    # linear: deg 6 freq 2; diophantine: 6/2; equations: 6/2 -> 9.0
    assert top["score_q6"] == 9.0
    # ranks strictly ordered
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))


def test_rake_stopword_segmentation_and_cap(spark):
    from png_from_pdf_extracter_spark.functions.keywords import (
        rake_keyphrases,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta the gamma the one two three four five")],
        "doc_id long, text string",
    )
    out = rake_keyphrases(df, stopwords=("the",), max_phrase_len=4).collect()
    phrases = {r["phrase"] for r in out}
    # the 5-word run is dropped by the length cap; runs split at 'the'
    assert "alpha beta" in phrases and "gamma" in phrases
    assert not any("five" in p for p in phrases)


def test_lexical_richness_hand_computed(spark):
    from png_from_pdf_extracter_spark.functions.text import (
        lexical_richness,
    )
    import math

    # corpus: a a a b b c  -> N=6 V=3 V1=1(c) V2=1(b) S2=9+4+1=14
    df = spark.createDataFrame(
        [("s", "a a A"), ("s", "b B c")], "source string, text string"
    )
    r = lexical_richness(df, "text", ("source",)).collect()[0]
    assert (r["n_tokens"], r["v_types"], r["v1"], r["v2"]) == (6, 3, 1, 1)
    yules = 1e4 * (14 - 6) / 36.0
    assert abs(r["yules_k_q6"] - yules) < 2e-6
    assert abs(r["guiraud_q6"] - 3 / math.sqrt(6)) < 2e-6
    assert abs(r["herdan_q6"] - math.log(3) / math.log(6)) < 2e-6
    honore = 100.0 * math.log(6) / (1.0 - 1.0 / 3.0)
    assert abs(r["honore_q6"] - honore) < 1e-5
    assert abs(r["sichel_q6"] - 1.0 / 3.0) < 2e-6
    assert abs(r["simpson_q6"] - (14 - 6) / 30.0) < 2e-6
    # chao1 bias-corrected: V + V1(V1-1)/(2(V2+1)) = 3 + 0 = 3
    assert abs(r["chao1_q6"] - 3.0) < 2e-6


def test_lexical_richness_all_hapax_honore_null(spark):
    from png_from_pdf_extracter_spark.functions.text import (
        lexical_richness,
    )

    df = spark.createDataFrame(
        [("s", "x y z w")], "source string, text string"
    )
    r = lexical_richness(df, "text", ("source",)).collect()[0]
    # every token hapax: Honore denominator hits 0 -> NULL, chao1 uses
    # the bias-corrected finite form
    assert r["honore_q6"] is None
    assert r["v1"] == r["v_types"] == 4
    assert r["chao1_q6"] == 4 + 4 * 3 / 2.0


def test_juilland_even_vs_concentrated(spark):
    from png_from_pdf_extracter_spark.functions.keywords import (
        juilland_dispersion,
    )

    # 'even' appears equally in all 4 parts; 'lump' only in one
    docs = []
    for p in range(4):
        docs.append((f"s{p}", "even even even"))
    docs.append(("s0", "lump lump lump lump lump lump lump lump lump"))
    df = spark.createDataFrame(docs, "source string, text string")
    out = {
        r["term"]: r
        for r in juilland_dispersion(df, "source", "text", top_k=5).collect()
    }
    assert out["even"]["d_q6"] >= 1.0 - 2e-6  # perfectly even
    assert out["even"]["n_parts_hit"] == 4
    # all mass in one of 4 parts: CV = sqrt(3), D = 1 - sqrt(3)/sqrt(3) = 0
    assert abs(out["lump"]["d_q6"]) < 2e-6
    assert out["lump"]["n_parts_hit"] == 1


def test_burrows_delta_flags_style_outlier(spark):
    from png_from_pdf_extracter_spark.functions.keywords import (
        burrows_delta,
    )

    # 4 parts share a function-word profile; the 5th inverts it
    normal = "the the the of of and a a the of"
    weird = "and and and and a a a a a and"
    rows = [(f"s{i}", normal) for i in range(4)] + [("weird", weird)]
    df = spark.createDataFrame(rows * 3, "source string, text string")
    out = {
        r["part"]: r["delta_q6"]
        for r in burrows_delta(df, "source", "text", top_k=4).collect()
    }
    assert out["weird"] > 1.5
    for i in range(4):
        assert out[f"s{i}"] < out["weird"]


def test_burrows_delta_uniform_parts_zero(spark):
    from png_from_pdf_extracter_spark.functions.keywords import (
        burrows_delta,
    )

    rows = [(f"s{i}", "x y z x y") for i in range(5)]
    df = spark.createDataFrame(rows, "source string, text string")
    out = burrows_delta(df, "source", "text", top_k=3).collect()
    # identical profiles: sd = 0 everywhere -> delta 0 for every part
    assert all(r["delta_q6"] == 0.0 for r in out)


def test_gries_dp_even_vs_confined(spark):
    import math

    from png_from_pdf_extracter_spark.functions.keywords import gries_dp

    # 2 parts of equal token mass; "even" spreads 50/50, "conf" is
    # confined to part a
    rows = [("a", "even conf filler1 filler2")] * 10
    rows += [("b", "even fillerx fillery fillerz")] * 10
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["term"]: r for r in gries_dp(df, top_k=20).collect()}
    # brute-force twin (absent cells included)
    def dp_twin(counts, psizes):
        nn = sum(psizes.values())
        t = sum(counts.values())
        s = 0.0
        for p, pn in psizes.items():
            v = counts.get(p, 0) / t
            s += abs(v - pn / nn)
        return 0.5 * s

    psz = {"a": 40, "b": 40}
    exp_even = dp_twin({"a": 10, "b": 10}, psz)
    exp_conf = dp_twin({"a": 10}, psz)
    assert abs(out["even"]["dp_q6"] - math.floor(exp_even * 1e6) / 1e6) < 2e-6
    assert abs(out["conf"]["dp_q6"] - math.floor(exp_conf * 1e6) / 1e6) < 2e-6
    assert out["even"]["dp_q6"] < 0.01
    assert out["conf"]["dp_q6"] > 0.49
    # normalization: smin = 0.5 -> dp_norm = dp / 0.5
    assert abs(out["conf"]["dp_norm_q6"] - out["conf"]["dp_q6"] * 2) < 1e-5
