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


def test_line_dedup_viral_line_hot_key(spark):
    """One viral boilerplate line repeated across 20k documents — the
    planted hot key the min((id,pos))-aggregate rewrite must survive.
    The old row_number window pinned every occurrence of the viral hash
    to ONE task; the aggregate+join shape is map-side combinable and
    AQE-skew-splittable, and the RESULT must be identical: the line
    survives only in the smallest (doc_id, pos)."""
    n = 20_000
    viral = "thank you for reading"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(viral + "\n"), F.format_string("unique line %d", F.col("id"))
        ).alias("text"),
    )
    out = line_dedup(docs, "doc_id", "text")
    agg = out.agg(
        F.sum("removed_lines").alias("rm"),
        F.sum(
            (F.col("clean_text").contains(viral)).cast("long")
        ).alias("keepers"),
        F.count("*").alias("docs"),
    ).collect()[0]
    # exactly one survivor of the viral line, every other doc loses it
    assert agg.docs == n and agg.keepers == 1 and agg.rm == n - 1
    first = out.filter(F.col("doc_id") == 0).collect()[0]
    assert first.clean_text.split("\n")[0] == viral


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


# ----------------------------------------------------- CCNet buckets

def test_perplexity_buckets_terciles(spark):
    # 9 docs with precomputed scores 1..9 -> three per bucket
    rows = [(i, float(i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    from rrdtool_1_x_spark.datapipe.textstats import perplexity_buckets

    got = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(df, score_col="s").collect()
    }
    # cuts: quantile(1/3)=3.666.., quantile(2/3)=6.333..
    assert [got[i] for i in range(1, 10)] == (
        ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3
    )


def test_perplexity_buckets_higher_score_is_head(spark):
    # repeated natural text = predictable transitions -> head; the SAME
    # common words in shuffled order = unseen transitions out of
    # high-count contexts -> tail. (A doc of corpus-unique words would
    # NOT work here: under a self-trained LM its hapax bigrams are
    # perfectly self-predicting, c12/c1 = 1/1.)
    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common) for i in range(6)] + [
        (10, "rug the mat dog cat on sat and the on mat cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from rrdtool_1_x_spark.datapipe.textstats import perplexity_buckets

    got = {r.doc_id: r for r in perplexity_buckets(df).collect()}
    assert got[0].ppl_bucket == "head"
    assert got[10].ppl_bucket == "tail"
    assert got[10].score < got[0].score


# ------------------------------------------------------------ tf-idf

def test_tfidf_topk_ranking_and_ties(spark):
    rows = [
        (1, "apple apple apple common"),
        (2, "banana banana common common"),
        (3, "common common common cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from rrdtool_1_x_spark.datapipe.textstats import tfidf_top_terms

    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # rare term with high tf dominates; 'common' (df=3 of 3, idf=0) never
    # outranks a rare term
    assert by_doc[1][0] == (1, "apple")
    assert by_doc[2][0] == (1, "banana")
    assert by_doc[3][0] == (1, "cherry")
    # ranks are dense 1..k and scores are exact integers / 1e6
    assert all(sorted(v)[0][0] == 1 for v in by_doc.values())


def test_tfidf_deterministic_tie_break(spark):
    # two terms with identical tf and df -> tie broken by term string
    rows = [(1, "zeta alpha"), (2, "zeta alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from rrdtool_1_x_spark.datapipe.textstats import tfidf_top_terms

    out = tfidf_top_terms(df, k=2).collect()
    for doc in (1, 2):
        terms = [r.term for r in sorted(out, key=lambda r: r.rank)
                 if r.doc_id == doc]
        assert terms == ["alpha", "zeta"]


# --------------------------------------------------- line-dedup index

def test_line_index_append_equals_one_shot(spark, tmp_path):
    from rrdtool_1_x_spark.datapipe.clean import (
        append_line_dedup, line_dedup, write_line_index,
    )

    rows = [
        (1, "boiler\nalpha one"),
        (2, "beta two\nboiler"),
        (3, "boiler\ngamma three\nbeta two"),
        (4, "delta four\ndelta four"),
    ]
    docs = _docs(spark, rows)
    one_shot = {r.doc_id: r for r in line_dedup(docs).collect()}

    path = str(tmp_path / "lineidx")
    first = docs.filter("doc_id <= 2")
    second = docs.filter("doc_id > 2")
    write_line_index(first, path)
    got = {r.doc_id: r for r in line_dedup(first).collect()}
    got.update({r.doc_id: r for r in append_line_dedup(second, path).collect()})

    for i in (1, 2, 3, 4):
        assert got[i].clean_text == one_shot[i].clean_text, i
        assert got[i].removed_lines == one_shot[i].removed_lines, i
        assert got[i].n_lines == one_shot[i].n_lines, i
    # second batch saw doc 1's 'boiler' and doc 2's 'beta two' via the index
    assert got[3].clean_text == "gamma three"
    assert got[4].clean_text == "delta four" and got[4].removed_lines == 1


def test_line_index_registers_novel_lines(spark, tmp_path):
    from rrdtool_1_x_spark.datapipe.clean import (
        append_line_dedup, write_line_index,
    )

    path = str(tmp_path / "lineidx")
    write_line_index(_docs(spark, [(1, "seed line")]), path)
    # batch A introduces 'fresh line'; batch B (later ids) must lose it
    append_line_dedup(_docs(spark, [(2, "fresh line")]), path).collect()
    out = append_line_dedup(
        _docs(spark, [(3, "fresh line\nown line")]), path
    ).collect()[0]
    assert out.removed_lines == 1 and out.clean_text == "own line"
    # index holds one row per distinct line hash
    idx = spark.read.parquet(f"{path}/lines")
    assert idx.count() == idx.select("line_hash").distinct().count() == 3


def test_append_line_dedup_replay_idempotent(spark, tmp_path):
    from rrdtool_1_x_spark.datapipe.clean import (
        append_line_dedup, write_line_index,
    )

    path = str(tmp_path / "lineidx")
    write_line_index(_docs(spark, [(1, "seed line")]), path)
    batch = _docs(spark, [(5, "seed line\nnovel a\nnovel a\nnovel b")])
    first = {r.doc_id: r for r in append_line_dedup(batch, path).collect()}
    n_idx = spark.read.parquet(f"{path}/lines").count()
    # replay the SAME batch (crashed micro-batch semantics)
    second = {r.doc_id: r for r in append_line_dedup(batch, path).collect()}
    assert first[5].clean_text == second[5].clean_text == "novel a\nnovel b"
    assert first[5].removed_lines == second[5].removed_lines == 2
    # the replay inserted nothing
    assert spark.read.parquet(f"{path}/lines").count() == n_idx == 3


def test_line_dedup_stream_equals_batch(spark, tmp_path):
    from rrdtool_1_x_spark.datapipe.clean import (
        line_dedup, write_line_index,
    )
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_line_dedup_stream,
    )

    rows = [
        (i, f"unique {i} here\nshared banner line\ntail {i % 4} common")
        for i in range(1, 13)
    ]
    docs = _docs(spark, rows)
    one_shot = {r.doc_id: r for r in line_dedup(docs).collect()}

    d1 = docs.filter("doc_id <= 4")
    path = str(tmp_path / "lineidx")
    write_line_index(d1, path)
    init = {r.doc_id: r for r in line_dedup(d1).collect()}

    # two appends arrive as two files -> two micro-batches
    src = str(tmp_path / "in")
    docs.filter("doc_id > 4 and doc_id <= 8").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    docs.filter("doc_id > 8").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_line_dedup_stream(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(300)

    streamed = {
        r.doc_id: r
        for r in spark.read.parquet(f"{path}/clean")
        .dropDuplicates(["doc_id"])
        .collect()
    }
    got = {**init, **streamed}
    assert set(got) == set(one_shot)
    for i in one_shot:
        assert got[i].clean_text == one_shot[i].clean_text, i
        assert got[i].removed_lines == one_shot[i].removed_lines, i


# -------------------------------------------------------- HTML extract

def test_extract_html_text_blocks_and_entities(spark):
    from rrdtool_1_x_spark.datapipe.clean import extract_html_text

    html = (
        '<html><head><style>.x{color:red}</style>'
        '<script type="text/javascript">var s="<p>not text</p>";</script>'
        "</head><body>"
        "<!-- a comment\nspanning lines -->"
        "<div>first   par with <b>inline</b> markup</div>"
        "<p>Tom &amp; Jerry say &quot;hi&quot; &lt;3</p>"
        "<p>double escaped: &amp;lt;</p>"
        "<ul><li>item one</li><li>item two</li></ul>"
        "<p>split<br>here</p>"
        "</body></html>"
    )
    out = extract_html_text(
        spark.createDataFrame([(1, html)], "doc_id long, html string")
    ).collect()[0]
    assert out.text.split("\n") == [
        "first par with inline markup",
        'Tom & Jerry say "hi" <3',
        "double escaped: &lt;",   # one level of un-escaping, like parsers
        "item one",
        "item two",
        "split",
        "here",
    ]
    assert out.n_lines == 7


def test_extract_html_text_feeds_c4(spark):
    from rrdtool_1_x_spark.datapipe.clean import (
        c4_line_filter, extract_html_text,
    )

    html = (
        "<p>this is a proper sentence one.</p>"
        "<p>this is a proper sentence two.</p>"
        "<p>this is a proper sentence three.</p>"
        "<div>nav</div>"
    )
    txt = extract_html_text(
        spark.createDataFrame([(1, html)], "doc_id long, html string")
    ).select("doc_id", "text")
    got = c4_line_filter(txt).collect()[0]
    assert got.page_kept is True and got.kept_lines == 3


# --------------------------------------------------- int8 quantized ANN

def test_quantize_embeddings_values(spark):
    from rrdtool_1_x_spark.datapipe.similarity import quantize_embeddings

    rows = [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # scale = max|v| = 1.0 -> q = round(v * 127)
    assert got[1].qvec == [127, -64, 32, 0]  # round(-63.5) away from zero
    assert got[1].scale == 1.0
    # zero vector: all-zero qvec, scale 0, no division-by-zero
    assert got[2].qvec == [0, 0, 0, 0] and got[2].scale == 0.0


def test_quantized_topk_recall_vs_float(spark):
    from rrdtool_1_x_spark.datapipe.similarity import (
        brute_force_topk, quantized_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        r.vec_id
        for r in brute_force_topk(emb, q, k=11).collect()
        if r.rank > 1  # drop the self-match
    }
    quant = {
        r.vec_id
        for r in quantized_topk(emb, q, k=11).collect()
        if r.rank > 1
    }
    # scalar int8 keeps >= 8/10 of the float top-10 on 64-dim embeddings
    assert len(exact & quant) >= 8, (exact, quant)


# ------------------------------------------------------- temperature mixing

def test_temperature_mix_hand_case(spark):
    # domain a: 9 tokens, domain b: 1 token -> raw shares 0.9 / 0.1;
    # sqrt-tempered weights prop. to 0.94868/0.31623 -> mix 0.75/0.25
    df = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine", "a"),
            (2, "solo", "b"),
        ],
        "doc_id long, text string, source string",
    )
    from rrdtool_1_x_spark.datapipe.sampling import temperature_mix

    out = {
        r["domain"]: r
        for r in temperature_mix(df, domain_col="source").collect()
    }
    assert out["a"].n_docs == 1 and out["a"].tok_cnt == 9
    assert out["b"].tok_cnt == 1
    assert out["a"].raw_share == 0.9 and out["b"].raw_share == 0.1
    wa, wb = math.sqrt(0.9), math.sqrt(0.1)
    assert abs(out["a"].mix_weight - wa / (wa + wb)) < 1e-6
    assert abs(out["b"].mix_weight - wb / (wa + wb)) < 1e-6
    # small domain is upweighted (epochs > 1), large downweighted
    assert out["b"].epochs > 1.0 > out["a"].epochs
    # mixture is a distribution
    assert abs(out["a"].mix_weight + out["b"].mix_weight - 1.0) < 2e-6


def test_temperature_mix_alpha_one_is_natural(spark):
    df = spark.createDataFrame(
        [(1, "x y z", "a"), (2, "w", "b")],
        "doc_id long, text string, source string",
    )
    from rrdtool_1_x_spark.datapipe.sampling import temperature_mix

    out = {
        r["domain"]: r
        for r in temperature_mix(df, domain_col="source", alpha=1.0).collect()
    }
    assert out["a"].mix_weight == out["a"].raw_share == 0.75
    assert out["a"].epochs == 1.0 and out["b"].epochs == 1.0


# --------------------------------------------------------------- data card

def test_corpus_datacard_hand_case(spark):
    from rrdtool_1_x_spark.datapipe.report import corpus_datacard

    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "web"),
            (2, "a b c", "en", "web"),     # exact dup of 1
            (3, "d e", "fr", "books"),
            (4, "f", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["metric"]: r["value"] for r in corpus_datacard(df).collect()}
    assert out["n_docs"] == 4.0
    assert out["n_tokens"] == 9.0
    assert out["n_chars"] == 5.0 + 5.0 + 3.0 + 1.0
    assert out["n_langs"] == 2.0 and out["n_sources"] == 2.0
    assert out["exact_dup_rate"] == 0.25
    assert out["mean_doc_tokens"] == 2.25
    # token counts sorted: 1,2,3,3 -> lower median at rank ceil(4/2)=2 -> 2
    assert out["median_doc_tokens"] == 2.0
    assert out["lang_share:en"] == 0.75 and out["lang_share:fr"] == 0.25
    # web 3/4, books 1/4 -> H = -(0.75 ln 0.75 + 0.25 ln 0.25)
    assert abs(out["source_entropy_nats"] - 0.562335) < 1e-6


# -------------------------------------------------------- mixture epochs

def test_apply_mixture_expected_counts(spark):
    from rrdtool_1_x_spark.datapipe.sampling import apply_mixture, temperature_mix

    # big domain 'a' (many short docs), small domain 'b'
    rows = [(i, "tok " * 9, "a") for i in range(200)] + [
        (1000 + i, "tok", "b") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    mix = temperature_mix(df, domain_col="source")
    eps = {r["domain"]: r["epochs"] for r in mix.collect()}
    out = apply_mixture(df, mix=mix, domain_col="source")
    counts = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    # per-domain materialized count is within 1 of n * epochs possible
    # bounds: floor(n*floor(eps)) <= cnt and the stochastic-rounding mean
    # keeps it within a few draws of n * eps
    assert abs(counts["a"] - 200 * eps["a"]) < 20
    assert abs(counts["b"] - 20 * eps["b"]) < 6
    # epochs < 1 domain is subsampled, > 1 repeated with copy column
    assert eps["a"] < 1.0 < eps["b"]
    max_copy = out.agg(F.max("copy")).collect()[0][0]
    assert max_copy == int(eps["b"]) or max_copy == int(eps["b"]) + 1
    # deterministic: same result on re-run
    again = {
        r["source"]: r["cnt"]
        for r in apply_mixture(df, mix=mix, domain_col="source")
        .groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert again == counts


def test_histogram_quantiles_hand_case(spark):
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.report import histogram_quantiles

    # values 1..10 per group: nearest-rank p50 = 5, p25 = 3, p90 = 9
    df = spark.range(10).select(
        (F.col("id") + 1).alias("v"), F.lit("g").alias("grp")
    )
    r = histogram_quantiles(
        df, F.col("v"), [0.25, 0.5, 0.75, 0.9], ["grp"]
    ).collect()[0]
    assert (r["n"], r["p25"], r["p50"], r["p75"], r["p90"]) == (10, 3, 5, 8, 9)
    # ungrouped form, duplicates collapse into histogram rows
    df2 = df.union(df).select("v")
    r2 = histogram_quantiles(df2, F.col("v"), [0.5]).collect()[0]
    assert r2["n"] == 20 and r2["p50"] == 5
