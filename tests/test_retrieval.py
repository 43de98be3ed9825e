"""Unit tests for the lexical-retrieval tier (datapipe.retrieval) and the
round-7 corpus-prep additions (pmi_collocations, chunk_documents,
normalize_text, url_canonical_dedup) — hand-checkable micro-corpora where
the expected values are derivable on paper, plus the edge cases the
sf-corpus oracle replay never exercises (empty docs, NULL text, partial
final chunks, NFD sequences the corpus lacks)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.retrieval import (
    bm25_topk,
    derive_queries,
    rrf_fuse,
)
from rrdtool_1_x_spark.datapipe.sampling import chunk_documents
from rrdtool_1_x_spark.datapipe.clean import normalize_text
from rrdtool_1_x_spark.datapipe.pii import url_canonical_dedup
from rrdtool_1_x_spark.datapipe.textstats import pmi_collocations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- BM25


def test_bm25_rare_term_outranks_common(spark):
    # 24 filler docs establish the df ranking; "zebra" is rarer than
    # "apple", so the doc matching the rare query term scores higher
    # within its query than a same-tf doc on a commoner term would.
    rows = [(i, "w%d common filler" % (i % 30)) for i in range(60)]
    rows += [(100 + i, "apple fruit" ) for i in range(10)]
    rows += [(200, "zebra stripes"), (201, "zebra zebra stripes")]
    out = bm25_topk(
        _docs(spark, rows), k=5, n_queries=2, terms_per_query=1
    ).collect()
    # every returned row has a positive score and ranks are 1..k dense
    by_q = {}
    for r in out:
        assert r.bm25 > 0
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert ranks == sorted(ranks)
        assert ranks[0] == 1


def test_bm25_tf_saturation(spark):
    # same dl, higher tf must still rank first (monotone in tf), but the
    # k1-saturated gap must be sublinear: tf=4 scores < 4x tf=1
    rows = [(i, "pad%d x" % i) for i in range(25)]
    rows += [
        (50, "q q q q a b c d"),
        (51, "q a b c d e f g"),
    ]
    df = _docs(spark, rows)
    out = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_topk(df, k=10, n_queries=6, terms_per_query=2).collect()
    }
    qd = [(q, d) for (q, d) in out if d in (50, 51)]
    if len(qd) >= 2:  # the derived-query window caught 'q'
        q = qd[0][0]
        assert out[(q, 50)] > out[(q, 51)]
        assert out[(q, 50)] < 4 * out[(q, 51)]


def test_derive_queries_skips_head_terms(spark):
    rows = [(i, "the the the rare%d" % i) for i in range(40)]
    df = _docs(spark, rows)
    from rrdtool_1_x_spark.datapipe.retrieval import _term_stats

    _, dfc, _ = _term_stats(df, "doc_id", "text")
    q = derive_queries(dfc, n_queries=3, terms_per_query=2, skip_top=1)
    terms = {r.term for r in q.collect()}
    assert "the" not in terms  # df-rank 1 is skipped
    assert len(terms) == 6


def test_rrf_fusion_score_formula(spark):
    # a doc at rank r in both lists gets exactly 2*round(1e6/(60+r))/1e6
    rows = [(i, "only%d term shared" % (i % 3)) for i in range(30)]
    out = rrf_fuse(_docs(spark, rows), k=3, n_queries=2, terms_per_query=1)
    for r in out.collect():
        # score must decompose into a sum of one or two rrf increments
        s = round(r.rrf * 1e6)
        singles = {round(1e6 / (60 + i)) for i in range(1, 21)}
        pairs = {a + b for a in singles for b in singles}
        assert s in singles | pairs


# ----------------------------------------------------------------- PMI


def test_pmi_collocation_beats_chance(spark):
    # "ice cream" always adjacent; "the" everywhere: PMI(ice cream) high,
    # and the pair ordering is deterministic
    rows = [(i, "ice cream the pad%d the" % (i % 4)) for i in range(20)]
    out = pmi_collocations(_docs(spark, rows), k=5, min_count=5).collect()
    top = out[0]
    assert top.bigram == "ice cream"
    # exact value: c_ab=20, c_a=20, c_b=20, T=100 -> ln(20*100/400)=ln 5
    assert top.pmi == pytest.approx(round(math.log(5) * 1e6) / 1e6)


def test_pmi_min_count_floor(spark):
    rows = [(1, "unique pair"), (2, "a b a b a b a b a b")]
    out = pmi_collocations(_docs(spark, rows), k=10, min_count=5).collect()
    assert all(r.bigram != "unique pair" for r in out)
    assert any(r.bigram == "a b" for r in out)


# --------------------------------------------------------------- chunks


def test_chunk_exact_cover_and_overlap(spark):
    toks = " ".join("t%d" % i for i in range(40))
    out = chunk_documents(
        _docs(spark, [(1, toks)]), chunk_size=32, stride=24
    ).collect()
    assert [r.chunk_id for r in out] == [0, 1]
    assert out[0].n_tok == 32 and out[1].n_tok == 16
    assert out[0].chunk_text.split()[:1] == ["t0"]
    # overlap: chunk 1 starts at token 24
    assert out[1].chunk_text.split()[0] == "t24"


def test_chunk_boundaries(spark):
    rows = [(1, ""), (2, "a"), (3, " ".join(["w"] * 32)),
            (4, " ".join(["w"] * 33))]
    out = chunk_documents(_docs(spark, rows), 32, 24)
    got = {r.doc_id: r for r in out.groupBy("doc_id").count().collect()}
    assert 1 not in got  # empty doc -> no chunks
    assert got[2]["count"] == 1 and got[3]["count"] == 1
    assert got[4]["count"] == 2  # 33 tokens spills one stride


# ------------------------------------------------------------- NFC norm


def test_nfc_composes_and_collapses(spark):
    out = normalize_text(
        _docs(spark, [(1, "cafe" + chr(769) + "  x\t y"), (2, None)])
    ).collect()
    r = {x.doc_id: x for x in out}
    assert r[1].norm_text == "café x y"
    assert r[1].changed == 1
    assert r[1].n_chars_raw == 11 and r[1].n_chars_norm == 8
    assert r[2].norm_text is None and r[2].changed == 0


def test_nfc_noop_is_flagged_unchanged(spark):
    out = normalize_text(_docs(spark, [(1, "plain ascii")])).collect()
    assert out[0].changed == 0
    assert out[0].norm_text == "plain ascii"


# ------------------------------------------------------------ URL dedup


def test_url_canonical_variants_collapse(spark):
    rows = [
        (1, "see https://WWW.Example.org/a/?utm=1"),
        (2, "see http://example.org/a#frag"),
        (3, "see https://example.org/a/"),
        (4, "see https://example.org/b"),
    ]
    out = {r.canon_url: r for r in url_canonical_dedup(_docs(spark, rows)).collect()}
    assert set(out) == {"example.org/a", "example.org/b"}
    a = out["example.org/a"]
    assert a.keeper_id == 1 and a.n_docs == 3 and a.n_urls == 3
    assert out["example.org/b"].keeper_id == 4


def test_url_dedup_counts_repeat_urls_within_doc(spark):
    rows = [(7, "x https://a.io/p y https://a.io/p z")]
    out = url_canonical_dedup(_docs(spark, rows)).collect()
    assert out[0].n_docs == 1 and out[0].n_urls == 2


# ------------------------------------------------- persisted BM25 index


def test_bm25_index_multi_append_equals_oneshot(spark, tmp_path):
    from rrdtool_1_x_spark.datapipe.retrieval import (
        append_bm25_index,
        bm25_topk,
        query_bm25_index,
        write_bm25_index,
    )

    rows = [(i, "w%d shared tail words here" % (i % 17)) for i in range(90)]
    df = _docs(spark, rows)
    path = str(tmp_path / "idx")
    write_bm25_index(df.filter("doc_id < 30"), path)
    append_bm25_index(df.filter("doc_id >= 30 and doc_id < 60"), path)
    append_bm25_index(df.filter("doc_id >= 60"), path)
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.bm25)
        for r in query_bm25_index(spark, path, k=5).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id, r.bm25)
        for r in bm25_topk(df, k=5).collect()
    )
    assert got == want


def test_bm25_index_query_prunes_buckets(spark, tmp_path):
    from rrdtool_1_x_spark.datapipe.retrieval import (
        query_bm25_index,
        write_bm25_index,
    )

    rows = [(i, "alpha beta gamma delta pad%d" % i) for i in range(40)]
    path = str(tmp_path / "idx")
    write_bm25_index(_docs(spark, rows), path)
    out = query_bm25_index(spark, path, k=3, n_queries=2, terms_per_query=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the postings scan must carry the p_bucket partition filter
    assert "p_bucket" in plan
    assert out.count() > 0


def test_bm25_index_stats_count_empty_docs(spark, tmp_path):
    # empty docs raise n_docs (idf denominator) but not avgdl
    from rrdtool_1_x_spark.datapipe.retrieval import write_bm25_index

    rows = [(1, "a b"), (2, ""), (3, "a c")]
    path = str(tmp_path / "idx")
    write_bm25_index(_docs(spark, rows), path)
    st = spark.read.parquet(path + "/stats").first()
    assert st.n_docs == 3 and st.n_docs_tok == 2 and st.sum_dl == 4
