"""Unit semantics for the corpus-cleaning operators (datapipe.clean) and
the DSIR importance weights (datapipe.sampling.dsir_logweights)."""

import math

from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.clean import c4_line_filter, line_dedup
from rrdtool_1_x_spark.datapipe.sampling import dsir_logweights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- C4 rules

def test_c4_line_rules(spark):
    page = "\n".join(
        [
            "this line has five good words.",   # kept
            "short line here.",                  # <5 words -> dropped
            "no terminal punctuation on this line",  # dropped
            "please enable javascript to continue now.",  # js -> dropped
            "another perfectly fine prose sentence!",  # kept (5 words, !)
            'a quoted sentence of five words"',  # kept (")
            "does a question of five words count?",  # kept (?)
        ]
    )
    out = c4_line_filter(_docs(spark, [(1, page)])).collect()[0]
    assert out.n_lines == 7
    assert out.kept_lines == 4
    assert out.page_kept is True
    assert out.clean_text.split("\n") == [
        "this line has five good words.",
        "another perfectly fine prose sentence!",
        'a quoted sentence of five words"',
        "does a question of five words count?",
    ]


def test_c4_page_rules(spark):
    ok = "good line number one stands here.\n" * 3
    few = "good line number one stands here."  # only 1 kept line
    lorem = ok + "\nwe pad with Lorem Ipsum filler text."
    brace = ok + "\nthis page contains { code } markers."
    rows = [(1, ok.strip()), (2, few), (3, lorem.strip()), (4, brace.strip())]
    got = {r.doc_id: r for r in c4_line_filter(_docs(spark, rows)).collect()}
    assert got[1].page_kept is True and got[1].clean_text
    assert got[2].page_kept is False and got[2].clean_text is None
    # lorem ipsum is case-insensitive and page-fatal even with enough lines
    assert got[3].page_kept is False
    assert got[4].page_kept is False


# ---------------------------------------------------------- line dedup

def test_line_dedup_first_occurrence(spark):
    rows = [
        (1, "alpha beta\nshared boilerplate line\ngamma delta"),
        (2, "shared boilerplate line\nunique two"),
        (3, "repeat me\nrepeat me\nunique three"),
    ]
    got = {r.doc_id: r for r in line_dedup(_docs(spark, rows)).collect()}
    # doc 1 saw the boilerplate first (doc order) -> keeps all 3 lines
    assert got[1].removed_lines == 0
    assert got[1].clean_text.split("\n") == [
        "alpha beta", "shared boilerplate line", "gamma delta"
    ]
    # doc 2 loses the shared line but keeps order
    assert got[2].removed_lines == 1
    assert got[2].clean_text == "unique two"
    # intra-document repeats: only the first survives
    assert got[3].removed_lines == 1
    assert got[3].clean_text.split("\n") == ["repeat me", "unique three"]
    assert all(got[i].n_lines == n for i, n in [(1, 3), (2, 2), (3, 3)])


def test_line_dedup_fully_removed_doc(spark):
    rows = [(1, "only line"), (2, "only line")]
    got = {r.doc_id: r for r in line_dedup(_docs(spark, rows)).collect()}
    assert got[1].clean_text == "only line"
    assert got[2].clean_text == "" and got[2].removed_lines == 1


# ---------------------------------------------------------------- DSIR

def test_dsir_logweights_matches_reference_formula(spark):
    rows = [
        (1, "apple banana apple", True),
        (2, "carrot durian", True),
        (3, "apple carrot egg egg", False),
        (4, "banana banana fig", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {
        r.doc_id: r
        for r in dsir_logweights(
            df, F.col("is_t"), buckets=8, seed="tst"
        ).collect()
    }

    # independent reference computation (pure python)
    import hashlib

    def bucket(tok):
        h = hashlib.md5(f"tst:{tok}".encode()).hexdigest()
        return int(h[:8], 16) % 8

    tc, rc = {}, {}
    docs = {}
    for doc_id, text, is_t in rows:
        bs = [bucket(t) for t in text.split()]
        docs[doc_id] = bs
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
            if is_t:
                tc[b] = tc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    for doc_id, bs in docs.items():
        expect = (
            sum(
                round(
                    math.log(
                        (tc.get(b, 0) + 1) / (tt + 8) * (rt + 8) / (rc[b] + 1)
                    )
                    * 1e6
                )
                for b in bs
            )
            / 1e6
        )
        assert out[doc_id].tok_cnt == len(bs)
        assert abs(out[doc_id].dsir_logweight - round(expect, 6)) < 1e-9


def test_dsir_target_docs_score_higher(spark):
    # target vocabulary is disjoint from the rest: target docs must get
    # strictly positive weights, non-target strictly negative
    rows = [(i, "tgtword special unique", True) for i in range(5)] + [
        (i + 10, "noise filler junk", False) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir_logweights(df, F.col("is_t"), buckets=64).collect()
    }
    assert all(got[i] > 0 for i in range(5))
    assert all(got[i + 10] < 0 for i in range(5))
