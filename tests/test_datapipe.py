"""Data-pipeline operators over the driver's documents/embeddings tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_hamming,
)
from rrdtool_1_x_spark.datapipe.multimodal import extract_features, synthesize_media
from rrdtool_1_x_spark.datapipe.similarity import (
    brute_force_topk,
    cosine_similarity_col,
    lsh_bucketed_topk,
)
from rrdtool_1_x_spark.datapipe.textstats import (
    language_scores,
    quality_metrics,
    rolling_fingerprint,
    token_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # add near-duplicates: doc_id+10000 with one word changed; +20000 exact
    toks = F.split(F.col("text"), " ")
    near = base.limit(20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat_ws(" ", F.concat(F.lit("zzz"), toks[0]), F.expr("array_join(slice(split(text,' '), 2, 100000), ' ')")).alias("text"),
        "lang", "source", "n_chars",
    )
    exact = base.limit(10).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return base.unionByName(near).unionByName(exact).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(docs):
    out = exact_dedup(docs).cache()
    dups = out.filter(F.col("copies") > 1)
    assert dups.count() == 10  # the injected exact copies
    r = dups.first()
    assert r["keeper"] == min(r["ids"])


def test_minhash_near_duplicates(docs):
    pairs = minhash_near_duplicates(
        docs, num_hashes=16, bands=4, jaccard_threshold=0.5
    ).cache()
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    ids = {(a, b) for a, b in got}
    # exact copies are collapsed before LSH (exact_dedup's job) — no
    # pairwise rows among identical texts
    exact_pairs = {(float(i), float(i + 20000)) for i in range(10)}
    for a, b in exact_pairs:
        assert (a, b) not in ids, f"exact pair {a},{b} should be collapsed"
    # most one-word-changed docs should also surface
    near_hits = sum(1 for a, b in got if b - a == 10000)
    assert near_hits >= 10
    # and jaccard values are sane
    assert pairs.filter((F.col("jaccard") > 1.0) | (F.col("jaccard") < 0.5)).count() == 0
    # with collapse disabled the exact pairs come back (jaccard 1.0
    # collides in every band)
    raw = minhash_near_duplicates(
        docs, num_hashes=16, bands=4, jaccard_threshold=0.5, collapse_exact=False
    )
    raw_ids = {(r["id_a"], r["id_b"]) for r in raw.collect()}
    for a, b in exact_pairs:
        assert (a, b) in raw_ids, f"missing exact pair {a},{b}"


def test_minhash_hot_bucket_guards(spark):
    # 10k identical docs + one small near-dup cluster: without the guards
    # the identical block alone would emit ~50M candidate rows on one
    # shuffle key. With exact-collapse the block contributes nothing; the
    # genuine near-dups still surface.
    n = 10_000
    clones = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every single document here").alias("text"),
    )
    near = spark.createDataFrame(
        [
            (100_001, "alpha beta gamma delta epsilon zeta eta theta"),
            (100_002, "alpha beta gamma delta epsilon zeta eta iota"),
        ],
        "doc_id long, text string",
    )
    corpus = clones.unionByName(near)
    pairs = minhash_near_duplicates(
        corpus, num_hashes=16, bands=4, jaccard_threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100_001, 100_002) in got
    assert len(got) == 1  # the clone block emitted no pairwise rows
    # cap alone (collapse disabled): the 10k-doc bucket is over every
    # sane cap, so candidate generation drops it instead of exploding
    capped = minhash_near_duplicates(
        corpus, num_hashes=16, bands=4, jaccard_threshold=0.5,
        collapse_exact=False, max_bucket_size=512,
    ).collect()
    capped_ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (100_001, 100_002) in capped_ids
    assert len(capped_ids) == 1


def test_jaccard_exact_value(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    j = ngram_jaccard_pairs(pairs, docs, shingle_len=3).first()["jaccard"]
    # shingles: {abc,bcd,cde} vs {abc,bcd,cdf}: inter 2, union 4
    assert abs(j - 0.5) < 1e-9


def test_simhash(docs):
    fp = simhash(docs).cache()
    assert fp.count() == docs.count()
    # identical texts → identical fingerprints
    j = fp.alias("a").join(
        docs.select("doc_id", "text").alias("d"), F.col("a.doc_id") == F.col("d.doc_id")
    )
    base = {r["text"]: r["simhash"] for r in j.filter(F.col("a.doc_id") < 500).collect()}
    copies = j.filter(F.col("a.doc_id") >= 20000).collect()
    assert len(copies) == 10
    for r in copies:
        assert r["simhash"] == base[r["text"]]
    # near-dup pair has small hamming distance
    d = (
        fp.alias("x")
        .join(fp.alias("y"), F.col("x.doc_id") + 10000 == F.col("y.doc_id"))
        .select(simhash_hamming(F.col("x.simhash"), F.col("y.simhash")).alias("h"))
    )
    assert d.agg(F.avg("h")).first()[0] < 16


def test_brute_force_topk(emb):
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(emb, q, k=5).cache()
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"] and abs(r["cos_sim"] - 1.0) < 1e-6


def test_lsh_topk_recall(emb):
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, q, k=5)
    # synthetic embeddings are near-orthogonal noise — the hardest case for
    # LSH; 4-bit buckets over 10 tables give decent recall there
    approx = lsh_bucketed_topk(emb, q, k=5, num_planes=4, num_tables=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_simhash_near_duplicates(docs):
    """Pigeonhole blocking finds EXACTLY the brute-force hamming<=3 pairs
    (blocking is lossless below the block count)."""
    from rrdtool_1_x_spark.datapipe.dedup import simhash_near_duplicates

    fp = simhash(docs).cache()
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_fb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", simhash_hamming(F.col("_fa"), F.col("_fb")).alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )
    banded = simhash_near_duplicates(docs, max_hamming=3, blocks=4)
    bt = {(r["id_a"], r["id_b"], r["hamming"]) for r in brute.collect()}
    bd = {(r["id_a"], r["id_b"], r["hamming"]) for r in banded.collect()}
    assert bt == bd and len(bd) > 0  # exact copies (+20000) give hamming 0


def test_incremental_band_index(docs, tmp_path):
    """Append-only LSH maintenance composes exactly with the batch
    pipeline: full-corpus pairs == initial-build pairs ∪ append pairs."""
    from rrdtool_1_x_spark.datapipe.dedup import append_band_index, write_band_index

    kw = dict(num_hashes=8, bands=4, shingle_len=3)
    d1 = docs.filter(F.col("doc_id") < 10000)       # original corpus
    d2 = docs.filter(F.col("doc_id") >= 10000)      # near-dups + exact copies
    path = str(tmp_path / "bidx")
    write_band_index(d1, path, **kw)
    initial = minhash_near_duplicates(d1, jaccard_threshold=0.5, **kw)
    appended = append_band_index(d2, path, jaccard_threshold=0.5, **kw)
    full = minhash_near_duplicates(docs, jaccard_threshold=0.5, **kw)
    key = lambda r: (r["id_a"], r["id_b"], round(r["jaccard"], 9))
    f = {key(r) for r in full.collect()}
    inc = {key(r) for r in initial.collect()} | {key(r) for r in appended.collect()}
    assert f == inc and len(f) > 0
    # exact copies were dropped against the registry: appending them again
    # yields nothing new
    again = append_band_index(
        d2.filter(F.col("doc_id") >= 20000), path, jaccard_threshold=0.5, **kw
    )
    assert again.count() == 0


def test_ivf_topk(emb):
    from rrdtool_1_x_spark.datapipe.similarity import ivf_centroid_model, ivf_topk

    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    # a probed query finds itself: the query's own cell is always probed
    # first, so rank 1 is the query at cos 1.0
    out = ivf_topk(emb, q, k=5, nlist=8, nprobe=2).cache()
    for r in out.filter(F.col("rank") == 1).collect():
        assert r["vec_id"] == r["query_id"] and abs(r["cos_sim"] - 1.0) < 1e-6
    # probing every cell is exhaustive: equals brute force exactly
    exact = brute_force_topk(emb, q, k=5)
    full = ivf_topk(emb, q, k=5, nlist=8, nprobe=8)
    e = [(r["query_id"], r["vec_id"], r["rank"]) for r in exact.collect()]
    a = [(r["query_id"], r["vec_id"], r["rank"]) for r in full.collect()]
    assert sorted(e) == sorted(a)
    # training is deterministic: same corpus -> same model
    m1 = ivf_centroid_model(emb, nlist=8)
    m2 = ivf_centroid_model(emb, nlist=8)
    assert m1 == m2
    # every corpus vector lands in exactly one of the nlist cells
    from rrdtool_1_x_spark.datapipe.similarity import _centroid_scores

    cells = (
        emb.select((-F.array_max(_centroid_scores(F.col("embedding"), m1))["nc"]).alias("c"))
        .groupBy("c").count()
    )
    assert cells.count() <= 8
    assert cells.agg(F.sum("count")).first()[0] == emb.count()


def test_ivf_index_pruning(spark, emb, tmp_path):
    """The persisted IVF index serves the same results as the inline path,
    and the probe filter prunes index partitions at scan time."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        ivf_topk,
        ivf_topk_indexed,
        write_ivf_index,
    )

    m = ivf_centroid_model(emb, nlist=8)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, m)
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    inline = ivf_topk(emb, q, k=5, nlist=8, nprobe=2, model=m)
    indexed = ivf_topk_indexed(spark, path, q, m, k=5, nprobe=2)
    a = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in inline.collect())
    b = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in indexed.collect())
    assert a == b
    # pruning is visible in the physical plan's partition filters
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace("  ", " ") or "cell" in plan.split("PartitionFilters")[1][:120]


def test_cosine_col(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
                               "a array<double>, b array<double>")
    vals = df.select(cosine_similarity_col(F.col("a"), F.col("b")).alias("c")).collect()
    assert abs(vals[0]["c"]) < 1e-12 and abs(vals[1]["c"] - 1.0) < 1e-12


def test_textstats(docs):
    out = quality_metrics(token_stats(language_scores(docs)))
    r = out.filter(F.col("doc_id") == 0).first()
    assert r["token_cnt"] > 0 and r["char_cnt"] == len(r["text"])
    assert 0 <= r["alpha_ratio"] <= 1 and 0 <= r["quality_score"] <= 1
    # language guess should correlate with labels on the en subset
    en = out.filter((F.col("lang") == "en") & F.col("lang_guess").isNotNull())
    hit = en.filter(F.col("lang_guess") == "en").count()
    assert hit / max(en.count(), 1) > 0.6


def test_fingerprint(docs):
    fp = rolling_fingerprint(docs)
    base = {r["doc_id"]: r["fingerprint"] for r in fp.collect()}
    for i in range(10):
        assert base[i + 20000] == base[i]  # exact copies share fingerprints


def test_multimodal_features(spark, docs):
    media = synthesize_media(spark, docs.limit(50))
    feats = extract_features(media, feat_dim=32).cache()
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert r["feat_dim"] == 32 and len(r["feat"]) == 32
        assert all(0.0 <= v <= 1.0 for v in r["feat"])
    # strict mode surfaces the stub boundary
    import pytest as _pt

    with _pt.raises(Exception, match="NotImplementedError|no codec"):
        extract_features(media, strict=True).collect()


def test_duplicate_groups_and_report(spark, docs):
    from rrdtool_1_x_spark.datapipe.dedup import dedup_report, duplicate_groups

    # chain: a-b, b-c in one component; d-e separate
    pairs = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 3.0), (10.0, 11.0)], "id_a double, id_b double"
    )
    groups = duplicate_groups(pairs)
    got = {r["doc_id"]: r["group_id"] for r in groups.collect()}
    assert got == {1.0: 1.0, 2.0: 1.0, 3.0: 1.0, 10.0: 10.0, 11.0: 10.0}

    rep = dedup_report(docs, groups)
    assert rep["dup_groups"] == 2
    assert rep["docs_removed"] == 3  # 5 members - 2 keepers
    assert rep["docs_kept"] == rep["total_docs"] - 3


def test_weighted_jaccard_hand_computed(spark):
    """w(s) = floor(1e6/df); rare shared shingles dominate boilerplate."""
    from rrdtool_1_x_spark.datapipe.dedup import weighted_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "common base rare pair"),
            (2, "common base rare pair"),
            (3, "common base other text"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    # shingle_len=2 shingles: d1=d2={common base, base rare, rare pair},
    # d3={common base, base other, other text}
    # df: common base=3, base rare=2, rare pair=2, base other=1, other text=1
    out = {(r["id_a"], r["id_b"]): r["wjaccard"]
           for r in weighted_jaccard_pairs(pairs, docs, shingle_len=2).collect()}
    w_cb, w_half, w_uniq = 1_000_000 // 3, 500_000, 1_000_000
    t12 = w_cb + 2 * w_half
    assert abs(out[(1, 2)] - 1.0) < 1e-12  # identical docs
    want13 = w_cb / (t12 + (w_cb + 2 * w_uniq) - w_cb)
    assert abs(out[(1, 3)] - want13) < 1e-12


def test_incremental_simhash_index(docs, tmp_path):
    """SimHash append-only maintenance composes exactly with the batch
    pipeline (full == initial ∪ appends), including the hamming-0 pairs of
    exact copies — simhash has no exact-dup registry by design."""
    from rrdtool_1_x_spark.datapipe.dedup import (
        append_simhash_index,
        simhash_near_duplicates,
        write_simhash_index,
    )

    kw = dict(max_hamming=3, blocks=4, hash_fn="md5")
    d1 = docs.filter(F.col("doc_id") < 10000)
    d2 = docs.filter(F.col("doc_id") >= 10000)
    path = str(tmp_path / "sidx")
    write_simhash_index(d1, path, blocks=4, hash_fn="md5")
    initial = simhash_near_duplicates(d1, **kw)
    appended = append_simhash_index(d2, path, **kw)
    full = simhash_near_duplicates(docs, **kw)
    key = lambda r: (r["id_a"], r["id_b"], r["hamming"])
    f = {key(r) for r in full.collect()}
    inc = {key(r) for r in initial.collect()} | {key(r) for r in appended.collect()}
    assert f == inc and len(f) > 0
    # the exact copies surface as hamming-0 pairs through the append path
    assert any(a + 20000 == b and h == 0 for a, b, h in inc)


def test_near_dup_streams_match_batch(spark, docs, tmp_path):
    """Structured Streaming drive: documents streamed file-by-file through
    foreachBatch into the persisted indexes accumulate exactly the batch
    pipeline's pairs (minhash and simhash)."""
    from rrdtool_1_x_spark.datapipe.dedup import (
        simhash_near_duplicates,
        write_band_index,
        write_simhash_index,
    )
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_minhash_stream,
        start_simhash_stream,
    )

    mkw = dict(num_hashes=8, bands=4, shingle_len=3)
    skw = dict(max_hamming=3, blocks=4, hash_fn="md5")
    d1 = docs.filter(F.col("doc_id") < 10000)
    d2 = docs.filter(F.col("doc_id") >= 10000)
    midx, sidx = str(tmp_path / "midx"), str(tmp_path / "sidx")
    write_band_index(d1, midx, **mkw)
    write_simhash_index(d1, sidx, blocks=4, hash_fn="md5")

    # two appends arrive as two files → two micro-batches
    src = str(tmp_path / "in")
    d2.filter(F.col("doc_id") < 20000).coalesce(1).write.mode("append").parquet(src)
    d2.filter(F.col("doc_id") >= 20000).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q1 = start_minhash_stream(
        stream, midx, str(tmp_path / "ck1"), jaccard_threshold=0.5, **mkw
    )
    q1.awaitTermination(300)
    q2 = start_simhash_stream(stream, sidx, str(tmp_path / "ck2"), **skw)
    q2.awaitTermination(300)

    mkey = lambda r: (r["id_a"], r["id_b"], round(r["jaccard"], 9))
    full_m = {mkey(r) for r in minhash_near_duplicates(docs, jaccard_threshold=0.5, **mkw).collect()}
    init_m = {mkey(r) for r in minhash_near_duplicates(d1, jaccard_threshold=0.5, **mkw).collect()}
    streamed_m = {
        mkey(r)
        for r in spark.read.parquet(f"{midx}/pairs").dropDuplicates(["id_a", "id_b"]).collect()
    }
    assert full_m == init_m | streamed_m and len(streamed_m) > 0

    skey = lambda r: (r["id_a"], r["id_b"], r["hamming"])
    full_s = {skey(r) for r in simhash_near_duplicates(docs, **skw).collect()}
    init_s = {skey(r) for r in simhash_near_duplicates(d1, **skw).collect()}
    streamed_s = {
        skey(r)
        for r in spark.read.parquet(f"{sidx}/pairs").dropDuplicates(["id_a", "id_b"]).collect()
    }
    assert full_s == init_s | streamed_s and len(streamed_s) > 0


def test_append_ivf_index(spark, emb, tmp_path):
    """Appending to a persisted IVF index equals rebuilding it: assignment
    is a pure function of the frozen model, so old rows never move and the
    probe path sees the union."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        append_ivf_index,
        ivf_centroid_model,
        ivf_topk_indexed,
        write_ivf_index,
    )

    model = ivf_centroid_model(emb, nlist=8)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    write_ivf_index(half, inc_path, model)
    append_ivf_index(rest, inc_path, model)
    write_ivf_index(emb, full_path, model)
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    key = lambda r: (r["query_id"], r["vec_id"], r["rank"])
    a = sorted(key(r) for r in ivf_topk_indexed(spark, inc_path, q, model, k=5, nprobe=8).collect())
    b = sorted(key(r) for r in ivf_topk_indexed(spark, full_path, q, model, k=5, nprobe=8).collect())
    assert a == b and len(a) == 15


def test_brute_force_arrow_kernel(spark, emb):
    """The Arrow GEMM kernel returns the same top-k as the fold kernel
    (sims to 1e-9; BLAS reassociation keeps it out of hash-gated paths),
    including NULL — not NaN — similarity for zero-norm vectors."""
    zero = spark.createDataFrame(
        [(999999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(zero)
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    a = brute_force_topk(corpus, q, k=5, kernel="fold").collect()
    b = brute_force_topk(corpus, q, k=5, kernel="arrow").collect()
    ka = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"]) for r in a}
    kb = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"]) for r in b}
    assert ka.keys() == kb.keys() and len(ka) == 15
    for key in ka:
        va, vb = ka[key], kb[key]
        assert va[0] == vb[0] and abs(va[1] - vb[1]) < 1e-9
    # the zero vector got NULL sim in both kernels (never ranks)
    for rows in (a, b):
        assert all(r["vec_id"] != 999999 for r in rows)


def test_brute_force_arrow_kernel_contract(spark, emb):
    """kernel='arrow' honors the full brute_force_topk contract: string id
    columns (the schema is derived from the inputs, not hardcoded long) and
    an empty query set returning an empty frame of the right shape."""
    corpus = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    q = emb.limit(2).select(
        F.concat(F.lit("q-"), F.col("vec_id")).alias("query_id"), "embedding"
    )
    rows = brute_force_topk(corpus, q, k=3, kernel="arrow").collect()
    assert len(rows) == 6
    assert all(r["vec_id"].startswith("doc-") and r["query_id"].startswith("q-") for r in rows)
    # empty query set: no crash, empty result, stable schema
    empty_q = q.limit(0)
    out = brute_force_topk(corpus, empty_q, k=3, kernel="arrow")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["query_id", "vec_id", "cos_sim", "rank"]


def test_embed_near_dup_arrow_kernel_identical(spark, emb):
    """The default arrow kernel (GEMM guard-band + exact fold re-score)
    returns BIT-IDENTICAL pairs to the pure fold path — the property that
    lets the fast path live inside the hash-gated oracle entries."""
    from rrdtool_1_x_spark.datapipe.similarity import embedding_near_duplicates

    kw = dict(threshold=0.35, dim=64, num_planes=4, num_tables=3)
    f = embedding_near_duplicates(emb, kernel="fold", **kw).collect()
    a = embedding_near_duplicates(emb, kernel="arrow", **kw).collect()
    key = lambda r: (r["id_a"], r["id_b"], r["cos_sim"])
    assert sorted(map(key, f)) == sorted(map(key, a))
    assert len(f) > 0


def test_ivf_topk_arrow_kernel_identical(spark, emb):
    """Arrow-kernel IVF (GEMM assignment with near-tie fallback, guard-band
    top-k + exact re-rank) is bit-identical to the fold path, including on
    zero-norm vectors (NULL sim, never NaN)."""
    from rrdtool_1_x_spark.datapipe.similarity import ivf_topk

    zero = spark.createDataFrame(
        [(999999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(zero)
    q = corpus.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    f = ivf_topk(corpus, q, k=10, nlist=16, nprobe=4, kernel="fold").collect()
    a = ivf_topk(corpus, q, k=10, nlist=16, nprobe=4, kernel="arrow").collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["cos_sim"])
    assert sorted(map(key, f)) == sorted(map(key, a)) and len(f) == 20


def test_repetition_metrics(spark):
    """Gopher repetition rules: hand-computed duplicate-line and
    top-bigram fractions."""
    from rrdtool_1_x_spark.datapipe.textstats import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # bigrams: ab ba ab ba ab -> 3/5
            (2, "x\ny\nx\nz"),           # 4 lines, 3 distinct -> 0.25
            (3, "one"),                  # no bigrams -> null
            (4, ""),                     # single empty line -> 0.0, null
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert abs(got[1]["top_bigram_frac"] - 3 / 5) < 1e-12
    assert got[1]["dup_line_frac"] == 0.0
    assert abs(got[2]["dup_line_frac"] - 0.25) < 1e-12
    assert got[3]["top_bigram_frac"] is None
    assert got[4]["dup_line_frac"] == 0.0
    assert got[4]["top_bigram_frac"] is None


def test_pii_metrics_and_redaction(spark):
    from rrdtool_1_x_spark.datapipe.pii import pii_metrics, redact_pii

    rows = [
        (1, "mail me at jo.doe+x@sub.example.co.uk or visit https://a.b/c?d=1 now"),
        (2, "server 192.168.10.1 and 10.0.0.255 call +41 79 123 45 67"),
        (3, "http://u:p@host/path has an embedded credential"),
        (4, "plain text with no sensitive spans at all"),
        (5, "dial +1-555-0142 or +44-20-7946-0958 asap"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in redact_pii(pii_metrics(df)).orderBy("doc_id").collect()
    }
    assert (got[1]["email_cnt"], got[1]["url_cnt"]) == (1, 1)
    assert "<EMAIL>" in got[1]["redacted"] and "<URL>" in got[1]["redacted"]
    assert got[2]["ipv4_cnt"] == 2 and got[2]["phone_cnt"] == 1
    assert got[2]["redacted"].count("<IP>") == 2
    # a URL with userinfo redacts as ONE url span (order: URL before email)
    assert got[3]["redacted"] == "<URL> has an embedded credential"
    assert got[4]["pii_total"] == 0 and got[4]["redacted"] == rows[3][1]
    assert got[5]["phone_cnt"] == 2 and got[5]["redacted"].count("<PHONE>") == 2


def test_unigram_logprob_hand_computed(spark):
    import math

    from rrdtool_1_x_spark.datapipe.textstats import unigram_logprob

    # corpus: 6 tokens total; freqs: a=3, b=2, c=1
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r
        for r in unigram_logprob(df, quantize=None).collect()
    }
    la, lb, lc = (math.log(f / 6) for f in (3, 2, 1))
    assert got[1]["token_cnt"] == 3 and got[2]["token_cnt"] == 3
    assert got[1]["unigram_logprob"] == pytest.approx((2 * la + lb) / 3, rel=1e-12)
    assert got[2]["unigram_logprob"] == pytest.approx((la + lb + lc) / 3, rel=1e-12)
    # the rare-word doc scores lower — the filtering signal
    assert got[2]["unigram_logprob"] < got[1]["unigram_logprob"]
    # quantized integer path stays within a micro-unit of the exact mean
    q = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    for k in (1, 2):
        assert q[k]["unigram_logprob"] == pytest.approx(
            got[k]["unigram_logprob"], abs=2e-6
        )


def test_curate_corpus_all_verdicts(spark):
    from rrdtool_1_x_spark.datapipe.pipeline import curate_corpus, curation_report

    body = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    eval_item = "which planet is closest to the sun answer mercury of course"
    rows = [
        (1, body + " one"),                      # kept
        (2, body + " one"),                      # exact dup of 1
        (3, body + " two extra trailing words"), # near dup of 1
        (4, "short junk"),                       # low quality (length rule)
        (5, "training doc leaking the eval " + eval_item),  # contaminated
        (6, "a b c d e f g h i j k l m n o p"),  # kept (distinct words)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    bench = spark.createDataFrame(
        [(100, eval_item)], "bench_id int, text string"
    )
    out = curate_corpus(
        docs, benchmark=bench, min_tokens=5,
        nd_kwargs=dict(num_hashes=8, bands=4, shingle_len=3,
                       jaccard_threshold=0.5),
    )
    got = {r["doc_id"]: r["verdict"] for r in out.collect()}
    assert got == {
        1: "kept", 2: "exact_dup", 3: "near_dup",
        4: "low_quality", 5: "contaminated", 6: "kept",
    }, got
    rep = {r["verdict"]: r["docs"] for r in curation_report(out).collect()}
    assert rep == {"kept": 2, "exact_dup": 1, "near_dup": 1,
                   "low_quality": 1, "contaminated": 1}


def test_curation_stream_prefix_consistent(spark, tmp_path):
    """Streaming curation: three micro-batches judged against everything
    seen so far match batch curate_corpus when components pair with their
    minimum directly; the inherent divergence (connection arriving LATER)
    is asserted explicitly as prefix-consistency."""
    from rrdtool_1_x_spark.datapipe.dedup import write_band_index
    from rrdtool_1_x_spark.datapipe.pipeline import curate_corpus
    from rrdtool_1_x_spark.streaming.datapipe_stream import start_curation_stream

    body = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    eval_item = "which planet is closest to the sun answer mercury of course"
    chunks = [
        [(1, body + " one"), (2, "a b c d e f g h i j k l m n o p")],
        [(3, body + " one"),                       # exact dup of 1
         (4, body + " two extra trailing words")], # near dup of 1
        [(5, "short junk"),                        # low quality
         (6, "training doc leaking the eval " + eval_item),  # contaminated
         (7, body + " one more tiny change")],     # near dup of 1
    ]
    schema = "doc_id int, text string"
    bench = spark.createDataFrame([(100, eval_item)], "bench_id int, text string")
    nd_kw = dict(num_hashes=8, bands=4, shingle_len=3, jaccard_threshold=0.5)

    state = str(tmp_path / "cur")
    write_band_index(spark.createDataFrame([], schema), f"{state}/lsh",
                     num_hashes=8, bands=4, shingle_len=3)
    src = str(tmp_path / "in")
    for chunk in chunks:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_curation_stream(
        stream, state, str(tmp_path / "ck"), benchmark=bench,
        min_tokens=5, **nd_kw,
    )
    q.awaitTermination(300)

    got = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(f"{state}/verdicts")
        .dropDuplicates(["doc_id"]).collect()
    }
    assert got == {
        1: "kept", 2: "kept", 3: "exact_dup", 4: "near_dup",
        5: "low_quality", 6: "contaminated", 7: "near_dup",
    }, got
    # one verdict per input doc, and batch equivalence on this corpus
    # (every near-dup pairs directly with its component minimum)
    all_docs = spark.createDataFrame(sum(chunks, []), schema)
    batch = {
        r["doc_id"]: r["verdict"]
        for r in curate_corpus(all_docs, benchmark=bench, min_tokens=5,
                               nd_kwargs=nd_kw).collect()
    }
    assert batch == got


def test_semantic_deduplicate_structure(spark, emb):
    """SemDeDup invariants: one row per vector, keep == dup_of IS NULL,
    dup_of is a LOWER id in the SAME cell clearing the threshold."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        cosine_similarity_col,
        semantic_deduplicate,
    )

    out = semantic_deduplicate(emb, threshold=0.2, nlist=8).cache()
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    bad = out.filter(F.col("keep") != F.col("dup_of").isNull()).count()
    assert bad == 0
    dups = out.filter(~F.col("keep"))
    assert dups.count() > 0  # the synthetic corpus is clustered
    assert dups.filter(F.col("dup_of") >= F.col("vec_id")).count() == 0
    # dup_of lives in the same cell, and the pair really clears 0.2
    cells = out.select(F.col("vec_id").alias("dup_of"),
                       F.col("cell").alias("rep_cell"))
    joined = dups.join(cells, "dup_of")
    assert joined.filter(F.col("cell") != F.col("rep_cell")).count() == 0
    va = emb.select(F.col("vec_id").alias("dup_of"),
                    F.col("embedding").alias("_a"))
    vb = emb.select("vec_id", F.col("embedding").alias("_b"))
    sims = dups.join(va, "dup_of").join(vb, "vec_id").select(
        cosine_similarity_col(F.col("_a"), F.col("_b")).alias("cs"))
    assert sims.filter(F.col("cs") < 0.2).count() == 0


def test_semantic_deduplicate_exact_copies(spark):
    """An exact copy with a higher id always dedups to the original, and
    the max_cell_size shard cap bounds the per-group GEMM (one keeper
    per shard of identical vectors)."""
    from rrdtool_1_x_spark.datapipe.similarity import semantic_deduplicate

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_deduplicate(df, threshold=0.99, nlist=1).collect()
    assert sum(r["keep"] for r in out) == 1
    assert all(r["dup_of"] == 0 for r in out if not r["keep"])
    capped = semantic_deduplicate(
        df, threshold=0.99, nlist=1, max_cell_size=2
    ).collect()
    # 6 identical vectors in 3 md5-ordered shards of 2 → 3 keepers
    assert sum(r["keep"] for r in capped) == 3


def test_bpe_token_stats_hand_computed(spark):
    """GPT-2 split-rule pieces on a punctuation/digit/contraction mix."""
    from rrdtool_1_x_spark.datapipe.textstats import bpe_token_stats

    text = "I'll see 42 dogs, don't panic!!"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = bpe_token_stats(df).collect()[0]
    # I |'ll | see | 42 | dogs |, | don |'t | panic |!!
    assert r["bpe_tokens"] == 10
    assert r["ws_tokens"] == 6
    assert r["chars_per_token"] == round(len(text) / 10, 6)


def test_duplicated_ngram_spans_hand_computed(spark):
    """Three shared 4-grams between A and B; C unique; D shorter than n."""
    from rrdtool_1_x_spark.datapipe.dedup import duplicated_ngram_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "c d e f g h x y z w"),
            (3, "p q r s t u v w2 x2 y2"),
            (4, "q r"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=4).collect()}
    assert out[1]["n_windows"] == 7 and out[1]["dup_windows"] == 3
    assert out[2]["n_windows"] == 7 and out[2]["dup_windows"] == 3
    assert out[1]["dup_fraction"] == round(3 / 7, 6)
    assert out[3]["dup_windows"] == 0
    assert out[4]["n_windows"] == 1 and out[4]["dup_windows"] == 0
    # the scale-path hash yields identical counts (narrower shuffle key)
    xx = {r["doc_id"]: r for r in
          duplicated_ngram_spans(df, n=4, hash_fn="xxhash64").collect()}
    assert {k: (v["n_windows"], v["dup_windows"]) for k, v in out.items()} \
        == {k: (v["n_windows"], v["dup_windows"]) for k, v in xx.items()}


def test_semantic_dedup_arrow_kernel_identical(spark, emb):
    """GEMM assignment + guard band ≡ the interpreted fold path, row for
    row (the same contract as the other arrow kernels)."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        semantic_deduplicate,
    )

    model = ivf_centroid_model(emb, nlist=8)
    a = semantic_deduplicate(
        emb, threshold=0.3, model=model, kernel="arrow"
    ).orderBy("vec_id").collect()
    f = semantic_deduplicate(
        emb, threshold=0.3, model=model, kernel="fold"
    ).orderBy("vec_id").collect()
    assert a == f


def test_remove_duplicate_spans(spark):
    """ExactSubstr-style span removal: canonical (lowest doc, lowest pos)
    occurrence kept, every other occurrence excised; internal repetition
    collapses to one copy; short unique docs untouched."""
    from rrdtool_1_x_spark.datapipe.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "c d e f g h x y z w"),
            (3, "p q r s p q r s p q r s"),
            (4, "q r"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=4).collect()}
    assert out[1]["text"] == "a b c d e f g h i j"  # canonical copy kept
    assert out[1]["removed_tokens"] == 0
    assert out[2]["text"] == "x y z w" and out[2]["removed_tokens"] == 6
    assert out[3]["text"] == "p q r s" and out[3]["removed_tokens"] == 8
    assert out[4]["text"] == "q r"
    # exact short duplicates: the higher id empties out entirely
    dd = spark.createDataFrame(
        [(1, "x1 x2 x3"), (2, "x1 x2 x3")], "doc_id long, text string"
    )
    o2 = {r["doc_id"]: r for r in remove_duplicate_spans(dd, n=4).collect()}
    assert o2[1]["text"] == "x1 x2 x3"
    assert o2[2]["text"] == "" and o2[2]["removed_tokens"] == 3


def test_hashed_embedding_properties(spark):
    """Hashing-trick embeddings: unit norm, text-deterministic, and
    directly consumable by the similarity operators."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        cosine_similarity_col,
        hashed_embedding,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "wholly different words here now")],
        "doc_id long, text string",
    )
    e = hashed_embedding(df, dim=32).cache()
    rows = {r["doc_id"]: r["embedding"] for r in e.collect()}
    for v in rows.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9
    assert rows[1] == rows[2]  # same text, same vector
    a = e.filter(F.col("doc_id") == 1).select(
        F.col("embedding").alias("_a"))
    b = e.filter(F.col("doc_id") == 3).select(
        F.col("embedding").alias("_b"))
    cs = a.crossJoin(b).select(
        cosine_similarity_col(F.col("_a"), F.col("_b")).alias("c")
    ).first()["c"]
    assert cs < 0.9  # different text, different direction
    raw = hashed_embedding(df, dim=32, normalize=False).collect()
    for r in raw:
        assert all(float(x).is_integer() for x in r["embedding"])


def test_bpe_train_sennrich_example(spark):
    """Sennrich et al. 2016's worked example: low x5, lower x2,
    newest x6, widest x3 — the first merges are (e,s), (es,t),
    (est,</w>), (l,o), (lo,w)."""
    from rrdtool_1_x_spark.datapipe.bpe import bpe_encode, train_bpe

    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                      + ["widest"] * 3)
    df = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    m = train_bpe(df, num_merges=5)
    assert m == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
                 ("lo", "w")]
    full = train_bpe(df, num_merges=10)
    assert full[:5] == m  # longer training extends, never rewrites
    enc = {r["doc_id"]: r for r in bpe_encode(df, full).collect()}
    pieces = enc[1]["pieces"]
    assert pieces[:5] == ["low</w>"] * 5  # 'low' merged to one piece
    assert enc[1]["n_pieces"] == len(pieces)
    # round-trip: stripping </w> markers reconstructs the text
    rebuilt = "".join(p for p in pieces).replace("</w>", " ").strip()
    assert rebuilt == corpus


def test_bpe_encode_unknown_symbols(spark):
    """Words with characters never seen in training stay as raw chars —
    no crash, no silent drop."""
    from rrdtool_1_x_spark.datapipe.bpe import bpe_encode

    df = spark.createDataFrame([(1, "xyz")], "doc_id long, text string")
    enc = bpe_encode(df, [("a", "b")]).collect()[0]
    assert enc["pieces"] == ["x", "y", "z", "</w>"]


def test_assign_cells_arrow_zero_centroid_parity(spark):
    """A zero-norm centroid must score -2.0 in the GEMM path like the
    fold path — not 0.0, which would beat every negative-cosine real
    centroid and dodge the guard-band fallback."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        _assign_cells_arrow,
        _exact_cell,
    )

    model = [(0, [0.0, 0.0], 0.0), (1, [1.0, 0.0], 1.0)]
    df = spark.createDataFrame(
        [(10, [-1.0, 0.0]), (11, [0.5, 0.5]), (12, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["cell"]
           for r in _assign_cells_arrow(df, model, "vec_id", "embedding").collect()}
    want = {10: _exact_cell([-1.0, 0.0], model),
            11: _exact_cell([0.5, 0.5], model),
            12: _exact_cell([0.0, 0.0], model)}
    assert got == want
    assert got[10] == 1  # negative cosine still beats the dead centroid


def test_bigram_logprob_hand_computed(spark):
    """Interpolated bigram score on a 2-doc corpus, hand-computed."""
    import math

    from rrdtool_1_x_spark.datapipe.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # corpus: tokens a:3 b:3 c:1, N=7; bigrams: (a,b):3, (b,a):1, (b,c):1
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    p_ab = 0.75 * (3 / 3) + 0.25 * (3 / 7)
    p_ba = 0.75 * (1 / 3) + 0.25 * (3 / 7)
    p_bc = 0.75 * (1 / 3) + 0.25 * (1 / 7)
    q = lambda p: round(math.log(p) * 1e6) / 1e6
    want1 = (2 * q(p_ab) + 1 * q(p_ba)) / 3
    want2 = (q(p_ab) + q(p_bc)) / 2
    assert out[1]["bigram_cnt"] == 3 and out[2]["bigram_cnt"] == 2
    assert abs(out[1]["bigram_logprob"] - want1) < 1e-9
    assert abs(out[2]["bigram_logprob"] - want2) < 1e-9
    # shuffled text scores lower than corpus-typical transitions
    assert out[1]["bigram_logprob"] > out[2]["bigram_logprob"]


def test_bigram_logprob_short_doc_edges(spark):
    """Documents with fewer than two tokens (incl. empty and NULL text)
    are absent from the output — the zip_with/slice edge the docstring
    pins; no spurious (w, null) or (w, '') bigram may leak in."""
    from rrdtool_1_x_spark.datapipe.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "  padded  "),
         (5, "two tokens")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert set(out) == {5}
    assert out[5]["bigram_cnt"] == 1


def test_oov_rate_vocab_boundary(spark):
    """Top-V vocabulary with deterministic tie-break on the token string;
    OOV counts occurrences (not distinct tokens); empty/NULL-text docs
    carry no tokens and are absent from the output."""
    from rrdtool_1_x_spark.datapipe.textstats import oov_rate

    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b d"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    # counts: a=3 b=3 c=1 d=1; top-2 = {a, b}
    out = {r["doc_id"]: r for r in oov_rate(df, vocab_size=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["token_cnt"] == 4 and out[1]["oov_cnt"] == 1
    assert out[1]["oov_rate"] == 0.25 and out[2]["oov_rate"] == 0.25
    # V=3: c and d tie at count 1 — the token-string tie-break admits c
    out3 = {r["doc_id"]: r for r in oov_rate(df, vocab_size=3).collect()}
    assert out3[1]["oov_cnt"] == 0 and out3[2]["oov_cnt"] == 1


def test_kneser_ney_hand_computed(spark):
    """Interpolated KN on a 2-doc corpus, hand-computed — including the
    exact per-w1 normalization identity the formula guarantees."""
    import math

    from rrdtool_1_x_spark.datapipe.textstats import kneser_ney_bigram

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # bc: (a,b)=3 (b,a)=1 (b,c)=1; B=3
    # c(a ·)=3 fanout(a)=1; c(b ·)=2 fanout(b)=2; fanin(b)=fanin(a)=fanin(c)=1
    p_ab = max(3 - 0.75, 0) / 3 + (0.75 * 1 / 3) * (1 / 3)
    p_ba = max(1 - 0.75, 0) / 2 + (0.75 * 2 / 2) * (1 / 3)
    p_bc = p_ba
    q = lambda p: round(math.log(p) * 1e6) / 1e6
    out = {r["doc_id"]: r for r in kneser_ney_bigram(df).collect()}
    assert out[1]["bigram_cnt"] == 3 and out[2]["bigram_cnt"] == 2
    assert abs(out[1]["kn_logprob"] - (2 * q(p_ab) + q(p_ba)) / 3) < 1e-9
    assert abs(out[2]["kn_logprob"] - (q(p_ab) + q(p_bc)) / 2) < 1e-9
    # discounted mass + redistributed continuation mass sum to 1 per w1:
    # observed sum + D*fanout/c1 * (unobserved continuation share)
    assert p_ab + (0.75 * 1 / 3) * (2 / 3) == pytest.approx(1.0)
    assert p_ba + p_bc + (0.75 * 2 / 2) * (1 / 3) == pytest.approx(1.0)


def test_kneser_ney_short_doc_edges(spark):
    """Sub-2-token docs (incl. empty/NULL) produce no bigram rows — same
    zip_with/slice edge rule as bigram_logprob."""
    from rrdtool_1_x_spark.datapipe.textstats import kneser_ney_bigram

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "two tokens")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in kneser_ney_bigram(df).collect()}
    assert set(out) == {4}
    assert out[4]["bigram_cnt"] == 1


def test_remove_spans_token_conservation(spark, docs):
    """On the real corpus: kept + removed == total tokens for every doc
    (the coverage mask never double-counts overlapping windows)."""
    from rrdtool_1_x_spark.datapipe.dedup import remove_duplicate_spans

    out = remove_duplicate_spans(docs, n=8)
    bad = out.filter(
        F.col("n_tokens") - F.col("removed_tokens")
        != F.when(F.col("text") == "", 0).otherwise(
            F.size(F.split(F.col("text"), " "))
        )
    ).count()
    assert bad == 0
    # the injected exact copies (+20000) lose everything; originals keep it
    gone = out.filter((F.col("doc_id") >= 20000) & (F.col("text") != ""))
    assert gone.count() == 0


def test_hashed_embedding_bag_of_words_invariance(spark):
    """The hashing trick is order-free: permuting tokens gives the
    identical vector."""
    from rrdtool_1_x_spark.datapipe.similarity import hashed_embedding

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "epsilon delta gamma beta alpha")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["embedding"]
            for r in hashed_embedding(df, dim=32).collect()}
    assert rows[1] == rows[2]


def test_best_quality_representatives(spark):
    """The group keeps its best-scoring member; ungrouped docs keep
    themselves; ties break to the lowest id."""
    from rrdtool_1_x_spark.datapipe.dedup import best_quality_representatives

    docs = spark.createDataFrame(
        [(1, "good clean prose with words"),
         (2, "g00d cl3an pr0se w1th w0rds 123 456"),  # digit-heavy twin
         (3, "an unrelated solitary document")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in
           best_quality_representatives(docs, pairs).collect()}
    assert out[1]["keep"] and out[1]["rep_id"] == 1
    assert not out[2]["keep"] and out[2]["rep_id"] == 1
    assert out[3]["keep"] and out[3]["group_id"] is None
    # tie on score -> lowest id wins
    tie = spark.createDataFrame(
        [(5, "same text here"), (6, "same text here")],
        "doc_id long, text string",
    )
    tp = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    o2 = {r["doc_id"]: r for r in
          best_quality_representatives(tie, tp).collect()}
    assert o2[5]["keep"] and not o2[6]["keep"] and o2[6]["rep_id"] == 5


def test_gopher_repetition_hand_computed(spark):
    """Rae et al. Table A1 measurements on a doc with known repetition:
    'a b a b a b' — bigrams: (a b)x3, (b a)x2 -> top2 = 3/5; all 5
    bigram positions duplicated? dup applies to n>=5; 5-grams: 2
    positions, both distinct -> dup5 = 0. Short doc: no 7..10-grams."""
    from rrdtool_1_x_spark.datapipe.textstats import gopher_repetition

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    r1 = out[1]
    assert r1["top2_frac"] == round(3 / 5, 6)
    assert r1["top3_frac"] == round(2 / 4, 6)  # (a b a)x2 of 4
    assert r1["dup5_frac"] == 0.0  # 'a b a b a' and 'b a b a b' distinct
    assert r1["dup6_frac"] == 0.0 and r1["dup10_frac"] is None  # len 6
    r2 = out[2]
    assert r2["top2_frac"] == 1.0  # single bigram
    assert r2["top3_frac"] is None and r2["dup5_frac"] is None
    # a genuinely duplicated 5-gram
    df2 = spark.createDataFrame(
        [(3, "p q r s t p q r s t")], "doc_id long, text string"
    )
    r3 = gopher_repetition(df2).collect()[0]
    # 6 five-gram positions; 'p q r s t' occurs twice -> 2/6
    assert r3["dup5_frac"] == round(2 / 6, 6)


# ------------------------------------------------------ product quantization

def test_pq_codebook_shape_and_encode_self(spark, emb):
    from rrdtool_1_x_spark.datapipe.similarity import (
        pq_codebook,
        pq_encode,
        pq_topk,
    )

    cb = pq_codebook(emb, m=8, codes=16)
    assert len(cb) == 8 and all(len(s) == 16 for s in cb)
    assert all(len(c) == 8 for s in cb for c in s)

    # the 16 md5-ordered sample vectors ARE the codebook: querying with
    # one of them must hit itself at distance 0, rank 1
    sample_id = (
        emb.orderBy(
            F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
        )
        .limit(1)
        .collect()[0]["vec_id"]
    )
    q = emb.filter(F.col("vec_id") == sample_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq_topk(emb, q, k=1, codebook=cb).collect()
    assert top[0]["vec_id"] == sample_id and top[0]["pq_dist"] == 0

    # codes are within range and one per subspace
    enc = pq_encode(emb, cb).collect()
    for r in enc:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_separates_tight_clusters(spark):
    from rrdtool_1_x_spark.datapipe.similarity import pq_topk

    # two tight clusters far apart in 16 dims (m=4 subspaces of 4)
    rows = []
    for i in range(20):
        base = 100.0 if i < 10 else -100.0
        rows.append((i, [base + (i % 5) * 0.5] * 16))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq_topk(df, q, k=10, m=4, codes=8).orderBy("rank").collect()
    assert [r["vec_id"] < 10 for r in top] == [True] * 10


def test_ann_recall_hand_case(spark):
    from rrdtool_1_x_spark.datapipe.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, v, r) for r, v in enumerate([10, 11, 12, 13], 1)],
        "query_id long, vec_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, v, r) for r, v in enumerate([10, 12, 99, 98], 1)],
        "query_id long, vec_id long, rank int",
    )
    out = ann_recall(approx, exact, k=4).collect()[0]
    assert out["n_exact"] == 4 and out["n_hit"] == 2
    assert out["recall_at_k"] == 0.5


def test_ivfpq_distances_match_pq_and_confinement(spark, emb):
    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        ivfpq_topk,
        pq_codebook,
        pq_topk,
    )

    q = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = ivf_centroid_model(emb, nlist=16)
    cb = pq_codebook(emb, m=8, codes=16)
    ivf = ivfpq_topk(
        emb, q, k=10, nlist=16, nprobe=4, model=model, codebook=cb
    ).collect()
    n = emb.count()
    full = {
        (r["query_id"], r["vec_id"]): r["pq_dist"]
        for r in pq_topk(emb, q, k=n, codebook=cb).collect()
    }
    assert len(ivf) > 0
    for r in ivf:
        # same (query, vec) pair must carry the identical ADC distance
        assert full[(r["query_id"], r["vec_id"])] == r["pq_dist"]
    # pruning is real: ivfpq's hit set per query is a subset of the full
    # PQ ranking but may skip better-ranked vectors in unprobed cells
    ivf_ids = {(r["query_id"], r["vec_id"]) for r in ivf}
    assert ivf_ids <= set(full)


def test_centroid_classifier_separable_case(spark):
    from rrdtool_1_x_spark.datapipe.similarity import (
        centroid_classify,
        centroid_model,
    )

    # two well-separated classes in 8 dims
    rows = [(i, [10.0 + (i % 3)] * 8, 0) for i in range(10)] + [
        (100 + i, [-10.0 - (i % 3)] * 8, 1) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    # a null-labeled row trains nothing but still gets classified
    df = df.union(
        spark.createDataFrame(
            [(999, [10.0] * 8, None)],
            "vec_id long, embedding array<double>, label int",
        )
    )
    model = centroid_model(df)
    assert [l for l, _ in model] == [0, 1]
    assert all(len(c) == 8 for _, c in model)
    out = {r["vec_id"]: r for r in centroid_classify(df, model=model).collect()}
    assert len(out) == 21
    assert all(r["correct"] == 1 for i, r in out.items() if i != 999)
    assert out[999]["pred"] == 0 and out[999]["correct"] == 0


def test_centroid_classifier_empty_model_raises(spark):
    import pytest as _pytest

    from rrdtool_1_x_spark.datapipe.similarity import centroid_classify

    df = spark.createDataFrame(
        [(1, [1.0] * 8, None)],
        "vec_id long, embedding array<double>, label int",
    )
    with _pytest.raises(ValueError, match="empty model"):
        centroid_classify(df)


def test_pq_index_split_append_equals_one_shot(spark, emb, tmp_path):
    from rrdtool_1_x_spark.datapipe.similarity import (
        append_pq_index,
        load_pq_codebook,
        pq_index_topk,
        pq_topk,
        write_pq_index,
    )

    first = emb.filter(F.col("vec_id") % 3 != 0)
    second = emb.filter(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "pqidx")
    cb = write_pq_index(first, path)
    assert load_pq_codebook(path) == cb
    append_pq_index(second, path)
    q = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        tuple(r) for r in pq_index_topk(spark, path, q, k=10).collect()
    )
    want = sorted(
        tuple(r) for r in pq_topk(emb, q, k=10, codebook=cb).collect()
    )
    assert got == want and len(got) == 20


# ---------------------------------------------------------------- residual PQ


def _clustered_vectors(n=800, k_clusters=10, dim=64, noise=0.03, seed=7):
    """Tightly clustered unit vectors: the regime where Jégou's residual
    encoding provably wins (coarse centroid captures the vector's energy,
    so ||x - c|| << ||x||). noise is PER-COMPONENT — keep it small enough
    that the noise norm (noise * sqrt(dim)) stays well under 1."""
    import numpy as np

    rng = np.random.default_rng(seed)
    C = rng.normal(size=(k_clusters, dim))
    C /= np.linalg.norm(C, axis=1)[:, None]
    X = C[np.arange(n) % k_clusters] + noise * rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1)[:, None]
    return [(int(i), [float(v) for v in X[i]]) for i in range(n)]


def test_residual_codebook_salt_not_degenerate(spark, emb):
    """The residual codebook MUST sample different vectors than the IVF
    centroids: the unsalted md5 order IS the centroid sample, whose
    residuals are all zero — a degenerate all-zero codebook."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        residual_cell_scales,
        residual_pq_codebook,
    )

    model = ivf_centroid_model(emb, nlist=16)
    scales = residual_cell_scales(emb, model)
    assert all(s >= 0 for s in scales.values()) and any(
        s > 0 for s in scales.values()
    )
    book = residual_pq_codebook(emb, model, scales, m=8, codes=16)
    nonzero = sum(
        1 for s in range(8) for c in range(16) if any(book[s][c])
    )
    assert nonzero > 0, "residual codebook degenerated to all zeros"


def test_residual_ivfpq_confinement_and_shape(spark, emb):
    """Residual-ADC hits are confined to probed cells (a subset of the
    corpus), distances are non-negative, ranks dense from 1."""
    from rrdtool_1_x_spark.datapipe.similarity import ivfpq_residual_topk

    q = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_residual_topk(emb, q, k=10, nprobe=4).collect()
    assert len(out) == 20
    by_q = {}
    for r in out:
        assert r["pq_dist"] >= 0
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, 11))


def test_residual_beats_raw_codes_on_clustered_corpus(spark):
    """The published IVFADC property (Jégou et al. §IV): at the same code
    budget, residual encoding out-recalls raw-vector encoding when the
    corpus clusters tightly. (On the isotropic synthetic embeddings the
    relation flips — recorded by the residual_recall gate and
    BASELINE.md.)"""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ann_recall,
        ivf_centroid_model,
        ivfpq_residual_topk,
        ivfpq_topk,
        quantized_topk,
    )

    df = spark.createDataFrame(
        _clustered_vectors(), "vec_id long, embedding array<double>"
    ).cache()
    q = df.orderBy("vec_id").limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = ivf_centroid_model(df, nlist=16)
    resid = ivfpq_residual_topk(df, q, k=10, nprobe=4, model=model)
    raw = ivfpq_topk(df, q, k=10, nlist=16, nprobe=4, m=8, codes=16, model=model)
    exact = quantized_topk(df, q, k=10, query_id_col="query_id")
    rr = ann_recall(resid, exact, k=10).agg(
        F.avg("recall_at_k").alias("r")
    ).collect()[0]["r"]
    rw = ann_recall(raw, exact, k=10).agg(
        F.avg("recall_at_k").alias("r")
    ).collect()[0]["r"]
    assert rr > rw, f"residual {rr} should beat raw {rw} on clustered data"
    df.unpersist()


# ------------------------------------------------------------- NB classifier


def test_nb_classifier_learns_separable_labels(spark):
    """On a corpus whose labels have disjoint vocabularies the hashed NB
    classifier must recover every label (training and scoring on the
    same docs — a sanity floor, not a generalization claim)."""
    from rrdtool_1_x_spark.datapipe.textstats import hashed_nb_classify

    rows = []
    for i in range(60):
        lab = ["aa", "bb", "cc"][i % 3]
        words = {"aa": "apple axe acorn", "bb": "boat bear berry",
                 "cc": "cat cliff coral"}[lab]
        rows.append((i, f"{words} {words.split()[i % 3]}", lab))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = hashed_nb_classify(df, n_buckets=256).collect()
    assert len(out) == 60
    assert all(r["correct"] == 1 for r in out)


def test_nb_classifier_empty_doc_predicts_null(spark):
    from rrdtool_1_x_spark.datapipe.textstats import hashed_nb_classify

    df = spark.createDataFrame(
        [(0, "hello world", "en"), (1, "   ", "en")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in hashed_nb_classify(df).collect()}
    assert out[1]["pred"] is None and out[1]["correct"] == 0


def test_nb_classifier_total_and_prior_floor_on_corpus(spark, docs):
    """The synthetic corpus's lang labels are textually signal-free (every
    language shares one vocabulary), so multinomial NB must collapse to
    the class prior — training accuracy lands exactly AT the majority
    floor, never below, and every non-empty document gets a prediction.
    (Learning itself is pinned by the separable-vocabulary test above.)"""
    from rrdtool_1_x_spark.datapipe.textstats import hashed_nb_classify

    out = hashed_nb_classify(docs).cache()
    n = docs.count()
    assert out.count() == n
    assert out.filter(F.col("pred").isNull()).count() == 0
    acc = out.agg(F.avg("correct")).collect()[0][0]
    majority = (
        docs.groupBy("lang").count().agg(F.max("count")).collect()[0][0] / n
    )
    assert acc >= majority - 1e-9, f"accuracy {acc} below prior floor {majority}"
    out.unpersist()


def test_hard_negatives_exclude_same_label(spark):
    from rrdtool_1_x_spark.datapipe.similarity import hard_negative_topk

    rows = []
    for i in range(30):
        lab = i % 3
        # cluster by label so same-label vectors are NEAREST — the filter
        # must skip them all
        rows.append((i, [float(lab * 10 + 1 + (i % 5) * 0.1)] * 8, lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        "embedding",
    )
    out = hard_negative_topk(df, q, k=5).collect()
    assert len(out) == 5
    assert all(r["neg_label"] != 0 for r in out)
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]


def test_source_overlap_hand_case(spark):
    from rrdtool_1_x_spark.datapipe.report import source_overlap

    df = spark.createDataFrame(
        [
            (0, "a b c d e f", "s1"),          # shingles: "a b c d e", "b c d e f"
            (1, "a b c d e x", "s2"),          # shares "a b c d e" with s1
            (2, "p q r s t u", "s3"),          # disjoint
        ],
        "doc_id long, text string, source string",
    )
    out = {(r["src_a"], r["src_b"]): r for r in source_overlap(df, n=5).collect()}
    assert len(out) == 3  # full pair grid, zero-overlap pairs included
    r12 = out[("s1", "s2")]
    assert (r12["n_a"], r12["n_b"], r12["n_common"]) == (2, 2, 1)
    assert r12["jaccard"] == round(1 / 3, 6)
    assert out[("s1", "s3")]["n_common"] == 0
    assert out[("s1", "s3")]["jaccard"] == 0.0


def test_bpe_encode_equals_rank_ordered_fold_property():
    """Property pinning the bpe_encode ORACLE's load-bearing claim:
    greedy rank-priority encoding (_encode_word) ≡ applying the merges in
    rank order, each as one left-to-right fold — merge r's components are
    built only by merges < r, so a later merge can never create an
    earlier pair. Pure-Python on randomized words and merge lists (no
    Spark), mirroring the trainer's fold exactly."""
    import random

    from rrdtool_1_x_spark.datapipe.bpe import END, _encode_word

    def fold_apply(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    def train(words, num_merges):
        # the trainer's loop over a {word: count} vocab, pure python
        from collections import Counter

        vocab = {w: list(w) + [END] for w in words}
        counts = Counter(words)
        merges = []
        for _ in range(num_merges):
            pc = Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += counts[w]
            if not pc:
                break
            # deterministic argmax: count desc, ties to the
            # lexicographically smallest pair (the trainer's orderBy)
            m = max(pc.values())
            cand = sorted(p for p, c in pc.items() if c == m)
            a, b = cand[0]
            if pc[(a, b)] < 2:
                break
            merges.append((a, b))
            vocab = {w: fold_apply(s, a, b) for w, s in vocab.items()}
        return merges

    rng = random.Random(42)
    for trial in range(200):
        alpha = "abc" if trial % 2 else "ab"
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(2, 12))
        ]
        merges = train(words, rng.randint(1, 12))
        ranks = {p: i for i, p in enumerate(merges)}
        for w in set(words):
            greedy = _encode_word(w, ranks)
            folded = list(w) + [END]
            for a, b in merges:
                folded = fold_apply(folded, a, b)
            assert greedy == folded, (w, merges, greedy, folded)


def test_diverse_sample_covers_every_nonempty_cell(spark, emb):
    from rrdtool_1_x_spark.datapipe.similarity import (
        diverse_sample,
        ivf_centroid_model,
    )

    model = ivf_centroid_model(emb, nlist=16)
    out = diverse_sample(emb, per_cell=3, model=model).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r["cell_rank"])
    # quota respected and ranks dense from 1 in every sampled cell
    for ranks in by_cell.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # coverage: cells holding >=3 vectors contribute the full quota
    assert sum(len(v) == 3 for v in by_cell.values()) >= len(by_cell) // 2


def test_edit_near_duplicates_blocking_and_budget(spark):
    """One-edit pairs sharing the 24-char prefix survive; a pair over the
    20% edit budget is rejected; a pair differing inside the prefix never
    blocks together; a block over the cap is dropped whole."""
    from rrdtool_1_x_spark.datapipe.dedup import edit_near_duplicates

    head = "alpha beta gamma delta epsilon"  # > 24 chars, shared prefix
    rows = [
        (1, head + " zeta eta theta iota kappa"),
        (2, head + " zeta eta theta iota kappb"),  # 1 substitution
        (3, head + " completely different tail words here now"),
        (4, "Xlpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    out = edit_near_duplicates(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["lev"] == 1
    assert pairs[(1, 2)]["edit_ratio"] == round(1 / len(rows[0][1]), 6)
    # same corpus, cap of 2: the 3-member block is dropped whole
    capped = edit_near_duplicates(
        spark.createDataFrame(rows, "doc_id long, text string"), block_cap=2
    )
    assert capped.count() == 0
    # a global threshold_cap >= the budget changes nothing
    fast = edit_near_duplicates(
        spark.createDataFrame(rows, "doc_id long, text string"),
        threshold_cap=20,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in fast} == {(1, 2)}
    # exact copies collapse to one representative (distance-0 pairs are
    # exact_dedup's job — and the 10x-replica quadratic scale-killer);
    # the variant still pairs against the min-id representative only
    dup_rows = rows + [(9, rows[0][1]), (10, rows[0][1])]
    out2 = edit_near_duplicates(
        spark.createDataFrame(dup_rows, "doc_id long, text string")
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out2} == {(1, 2)}


def test_hadamard_rotate_properties(spark):
    """The structured rotation is the exact integer H·D transform:
    hand-checkable values, and (the property PQ relies on) integer dot
    products scale by exactly dim — so cosine rankings are preserved
    bit-exactly."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        _hadamard_signs,
        hadamard_rotate,
    )

    dim = 8
    rows = [
        (1, [127.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 127.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (3, [31.0, -17.0, 5.0, 90.0, -2.0, 7.0, 11.0, 13.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["rvec"] for r in hadamard_rotate(df).collect()}
    d = _hadamard_signs(dim)
    # e_0 * 127 rotates to 127 * d_0 * column 0 of H (all ones)
    assert got[1] == [127 * d[0]] * dim
    # e_1 * 127 rotates to alternating signs times d_1
    assert got[2] == [127 * d[1] * (1 - 2 * (i & 1)) for i in range(dim)]
    # dot(H D x, H D y) == dim * dot(x, y), exactly, in integers
    q3 = [round(v / 90 * 127) for v in rows[2][1]]
    assert sum(a * b for a, b in zip(got[1], got[3])) == dim * 127 * (
        d[0] * d[0] * q3[0]
    )
    # non-power-of-two dimension is rejected
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="power of two"):
        hadamard_rotate(bad).collect()


def test_rotated_pq_recall_regimes(spark):
    """The published rotation story, pinned in both regimes: when corpus
    variance concentrates in one PQ subspace (dims 0-7 hot, rest ~0),
    rotating before PQ lifts recall@10 — the Ge et al. OPQ precondition;
    the balanced/isotropic regime is recorded in BASELINE.md where raw
    codes tie or edge out."""
    import random

    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.similarity import (
        ann_recall,
        hadamard_rotate,
        pq_topk,
        quantized_topk,
    )

    rnd = random.Random(7)
    rows = []
    for i in range(600):
        v = [0.0] * 64
        for j in range(8):
            v[j] = rnd.gauss(0, 10.0)
        for j in range(8, 64):
            v[j] = rnd.gauss(0, 0.05)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = quantized_topk(emb, q, k=10, query_id_col="query_id")
    raw = pq_topk(emb, q, k=10, m=8, codes=16)
    rot = hadamard_rotate(emb).cache()
    rc = rot.select("vec_id", F.col("rvec").alias("embedding"))
    rq = rot.join(
        q.select(F.col("query_id").alias("vec_id")), "vec_id"
    ).select(F.col("vec_id").alias("query_id"), F.col("rvec").alias("embedding"))
    rpq = pq_topk(rc, rq, k=10, m=8, codes=16)
    r_raw = ann_recall(raw, exact, k=10).agg(F.avg("recall_at_k")).first()[0]
    r_rot = ann_recall(rpq, exact, k=10).agg(F.avg("recall_at_k")).first()[0]
    assert r_rot > r_raw


def test_opq_allocation_properties(spark):
    """The learned allocation is a true permutation, deterministic, and
    spreads the m highest-variance dimensions one per subspace (the
    balancing property the recall win depends on)."""
    import random

    from rrdtool_1_x_spark.datapipe.similarity import (
        opq_dim_allocation,
        opq_permute,
        quantize_embeddings,
    )

    rnd = random.Random(11)
    rows = []
    for i in range(300):
        v = [0.0] * 64
        for j in range(8):  # hot dims bunched at the front
            v[j] = rnd.gauss(0, 10.0)
        for j in range(8, 64):
            v[j] = rnd.gauss(0, 0.05)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    perm = opq_dim_allocation(emb, m=8)
    assert sorted(perm) == list(range(64))  # permutation
    assert perm == opq_dim_allocation(emb, m=8)  # deterministic
    # the 8 hot dims (0-7) land one per subspace of width 8
    for s in range(8):
        hot = [d for d in perm[s * 8 : (s + 1) * 8] if d < 8]
        assert len(hot) == 1, f"subspace {s} got {hot}"
    # permute-then-quantize == quantize-then-gather (scale is order-free)
    pq1 = {
        r["vec_id"]: r["qvec"]
        for r in quantize_embeddings(opq_permute(emb, perm)).collect()
    }
    q = {
        r["vec_id"]: r["qvec"] for r in quantize_embeddings(emb).collect()
    }
    for vid, qv in q.items():
        assert pq1[vid] == [qv[p] for p in perm]


def test_opq_recall_beats_raw_and_matches_rotation_regime(spark):
    """Ge et al. regime pin for the learned allocation: on a variance-
    concentrated corpus OPQ allocation lifts recall@10 over raw PQ and
    is at least as good as the blind Hadamard rotation (it observes the
    actual variances instead of mixing indiscriminately)."""
    import random

    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.similarity import (
        ann_recall,
        hadamard_rotate,
        opq_dim_allocation,
        opq_permute,
        pq_topk,
        quantized_topk,
    )

    rnd = random.Random(7)
    rows = []
    for i in range(600):
        v = [0.0] * 64
        for j in range(8):
            v[j] = rnd.gauss(0, 10.0)
        for j in range(8, 64):
            v[j] = rnd.gauss(0, 0.05)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = quantized_topk(emb, q, k=10, query_id_col="query_id")
    raw = pq_topk(emb, q, k=10, m=8, codes=16)

    perm = opq_dim_allocation(emb, m=8)
    pc = opq_permute(emb, perm).cache()
    pqq = pc.join(
        q.select(F.col("query_id").alias("vec_id")), "vec_id"
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    opq = pq_topk(pc, pqq, k=10, m=8, codes=16)

    rot = hadamard_rotate(emb).cache()
    rc = rot.select("vec_id", F.col("rvec").alias("embedding"))
    rq = rot.join(
        q.select(F.col("query_id").alias("vec_id")), "vec_id"
    ).select(
        F.col("vec_id").alias("query_id"), F.col("rvec").alias("embedding")
    )
    rpq = pq_topk(rc, rq, k=10, m=8, codes=16)

    r_raw = ann_recall(raw, exact, k=10).agg(F.avg("recall_at_k")).first()[0]
    r_opq = ann_recall(opq, exact, k=10).agg(F.avg("recall_at_k")).first()[0]
    r_rot = ann_recall(rpq, exact, k=10).agg(F.avg("recall_at_k")).first()[0]
    assert r_opq > r_raw
    assert r_opq >= r_rot


def test_cluster_keywords_discriminative(spark):
    """Terms unique to one cluster outrank corpus-wide stopwords; ranks
    are dense per cell and capped at k."""
    from rrdtool_1_x_spark.datapipe.report import cluster_keywords

    docs = spark.createDataFrame(
        [
            (1, "the quantum flux measures the entangled state"),
            (2, "the quantum decoherence of the entangled qubit"),
            (3, "the recipe needs the flour and the butter"),
            (4, "the butter melts into the flour mixture"),
        ],
        "doc_id long, text string",
    )
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "doc_id long, cell long"
    )
    out = cluster_keywords(docs, assign, k=3).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    assert set(by_cell) == {0, 1}
    top0 = [r["term"] for r in sorted(by_cell[0], key=lambda r: r["rank"])]
    top1 = [r["term"] for r in sorted(by_cell[1], key=lambda r: r["rank"])]
    # "the" appears in both cells -> idf ln(3/3)=0 -> score 0; cluster
    # terms (cw=1 -> idf ln(3/2)>0) outrank it
    assert "quantum" in top0 and "entangled" in top0
    assert "the" not in top0[:2] and "the" not in top1[:2]
    assert all(len(v) <= 3 for v in by_cell.values())
    assert [r["rank"] for r in sorted(by_cell[0], key=lambda r: r["rank"])] == list(
        range(1, len(by_cell[0]) + 1)
    )


def test_kmeans_separates_clusters_and_is_deterministic(spark):
    from rrdtool_1_x_spark.datapipe.similarity import (
        kmeans_assign,
        kmeans_model,
    )

    # two tight blobs in 8 dims — k=2 must put each blob in one cluster
    rows = [(i, [10.0 + 0.1 * (i % 3)] * 8) for i in range(15)] + [
        (100 + i, [-10.0 - 0.1 * (i % 3)] * 8) for i in range(15)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m1 = kmeans_model(df, k=2, n_iter=3)
    m2 = kmeans_model(df, k=2, n_iter=3)
    assert m1 == m2  # md5 init + integer updates → fully deterministic
    out = kmeans_assign(df, model=m1).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(by_cluster) == 2
    blobs = sorted(frozenset(v) for v in by_cluster.values())
    assert sorted(map(sorted, blobs)) == [
        sorted(range(15)),
        sorted(range(100, 115)),
    ]
    # dist is the exact integer squared-L2 to the assigned centroid
    assert all(r["dist"] >= 0 for r in out)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from rrdtool_1_x_spark.datapipe.similarity import kmeans_model

    # k=3 over two identical points: at most 2 distinct init centroids
    # can win rows — the loser must keep its init centroid, not crash
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 8), (3, [-1.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    m = kmeans_model(df, k=3, n_iter=2)
    assert len(m) == 3 and all(len(c) == 8 for c in m)


def test_pagerank_authority_ordering_and_mass(spark):
    from rrdtool_1_x_spark.datapipe.graph import pagerank

    # star: 3 sources all cite hub; hub is dangling
    edges = spark.createDataFrame(
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 2)],
        "src string, dst string, w long",
    )
    out = {r["node"]: r["rank_micro"] for r in pagerank(edges, n_iter=5).collect()}
    assert set(out) == {"a", "b", "c", "hub"}
    # the cited hub must dominate every citer
    assert out["hub"] > max(out["a"], out["b"], out["c"])
    # citers receive only the base + dangling share → all equal
    assert out["a"] == out["b"] == out["c"]
    # integer floors lose a little mass but never create any
    total = sum(out.values())
    assert 0.9 * 10**12 < total <= 10**12


def test_pagerank_weighted_edges_split_proportionally(spark):
    from rrdtool_1_x_spark.datapipe.graph import pagerank

    # s cites x with weight 3 and y with weight 1 → x outranks y
    edges = spark.createDataFrame(
        [("s", "x", 3), ("s", "y", 1)], "src string, dst string, w long"
    )
    out = {r["node"]: r["rank_micro"] for r in pagerank(edges, n_iter=3).collect()}
    assert out["x"] > out["y"] > 0


def test_domain_link_edges_canonicalizes_hosts(spark):
    from rrdtool_1_x_spark.datapipe.graph import domain_link_edges

    df = spark.createDataFrame(
        [
            (1, "srcA", "see https://WWW.Example.org/a and http://example.org/b"),
            (2, "srcB", "none here"),
        ],
        "doc_id long, source string, text string",
    )
    rows = domain_link_edges(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src"], r["dst"], r["w"]) == ("srcA", "example.org", 2)


def test_ngram_diversity_hand_case(spark):
    from rrdtool_1_x_spark.datapipe.textstats import ngram_diversity

    df = spark.createDataFrame(
        [(1, "a b a b", "s1"), (2, "a a a", "s1"), (3, "x y", "s2")],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source"], r["n"]): r
        for r in ngram_diversity(df, max_n=2).collect()
    }
    # s1 unigrams: positions a,b,a,b,a,a,a = 7 total, {a,b} = 2 distinct
    assert out[("s1", 1)]["total_ngrams"] == 7
    assert out[("s1", 1)]["distinct_ngrams"] == 2
    # s1 bigrams: "a b","b a","a b" + "a a","a a" = 5 total, 3 distinct
    assert out[("s1", 2)]["total_ngrams"] == 5
    assert out[("s1", 2)]["distinct_ngrams"] == 3
    # s2: 2 unigrams both distinct → ttr 1.0; one bigram
    assert out[("s2", 1)]["ttr"] == 1.0
    assert out[("s2", 2)]["total_ngrams"] == 1


def test_bpe_fertility_counts(spark):
    from rrdtool_1_x_spark.datapipe.bpe import bpe_fertility, train_bpe

    df = spark.createDataFrame(
        [(1, "low low lower", "s1"), (2, "newest widest", "s1")],
        "doc_id long, text string, source string",
    )
    merges = train_bpe(df, num_merges=5)
    out = bpe_fertility(df, merges).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_words"] == 5
    assert r["n_chars"] == 13 + 13
    assert r["n_pieces"] >= r["n_words"]  # subwords never merge across words
    assert abs(r["pieces_per_word"] - r["n_pieces"] / 5) < 1e-9


def test_truncated_rerank_finds_full_dim_neighbors(spark, emb):
    from rrdtool_1_x_spark.datapipe.similarity import (
        quantized_topk,
        truncated_rerank_topk,
    )

    q = emb.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    two = truncated_rerank_topk(emb, q, k=10, prefix_dims=16, candidates=100)
    exact = quantized_topk(emb, q, k=10, query_id_col="query_id")
    got = {r["vec_id"] for r in two.collect()}
    want = {r["vec_id"] for r in exact.collect()}
    # with a wide candidate pool the two-stage result should recover
    # most of the exact top-10 (and is deterministic)
    assert len(got & want) >= 7
    assert got == {r["vec_id"] for r in two.collect()}


def test_knn_label_propagation_two_blobs(spark):
    from rrdtool_1_x_spark.datapipe.similarity import knn_label_propagation

    rows = [(i, [5.0 + 0.01 * i] * 8, 0 if i < 3 else None) for i in range(10)]
    rows += [(100 + i, [-5.0 - 0.01 * i] * 8, 1 if i < 3 else None) for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    seeds = df.filter("label is not null")
    out = {r["vec_id"]: r for r in knn_label_propagation(df, seeds, k=3).collect()}
    # every positive-blob vector (including unlabeled) votes label 0
    assert all(out[i]["pred_label"] == 0 for i in range(10) if i in out)
    assert all(out[100 + i]["pred_label"] == 1 for i in range(10) if 100 + i in out)
    # unlabeled rows see 3 same-blob seeds (unanimous); a seed row
    # excludes itself, so its majority is the 2 remaining blob-mates
    seeds_ids = {0, 1, 2, 100, 101, 102}
    assert all(
        r["votes"] == (2 if i in seeds_ids else 3) for i, r in out.items()
    )


def test_knn_label_propagation_tie_rules(spark):
    """Pins the Arrow kernel's tie rules against the documented window
    semantics: neighbor-rank ties go to the LOWEST seed id, vote-count
    ties to the LOWEST label, zero-norm rows/seeds drop out."""
    from rrdtool_1_x_spark.datapipe.similarity import knn_label_propagation

    # four seeds: 10/11 identical (sim tie -> sid decides which fills
    # the k=3 cut), 12 orthogonal-ish, 13 zero-norm (ignored)
    seeds = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0], 7),
            (11, [1.0, 0.0, 0.0, 0.0], 3),
            (12, [0.9, 0.1, 0.0, 0.0], 3),
            (13, [0.0, 0.0, 0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           knn_label_propagation(corpus, seeds, k=3).collect()}
    # row 1: top-3 = seeds 10, 11 (sim tie, both enter), 12 ->
    # votes 7:1, 3:2 -> label 3 wins with 2 votes
    assert out[1]["pred_label"] == 3 and out[1]["votes"] == 2
    # zero-norm corpus row has no valid candidates -> absent
    assert 2 not in out
    # vote tie: k=2 keeps seeds 10 (label 7) and 11 (label 3) -> 1:1
    # tie -> lowest label wins
    out2 = {r["vec_id"]: r for r in
            knn_label_propagation(corpus, seeds, k=2).collect()}
    assert out2[1]["pred_label"] == 3 and out2[1]["votes"] == 1
    # neighbor-rank tie at the cut: k=1, seeds 10/11 tie on sim ->
    # lowest seed id (10, label 7) takes the single slot
    out1 = {r["vec_id"]: r for r in
            knn_label_propagation(corpus, seeds, k=1).collect()}
    assert out1[1]["pred_label"] == 7 and out1[1]["votes"] == 1


def test_materialize_persist_mode_equivalence(spark, monkeypatch):
    """SPARK_GRAFT_MATERIALIZE=persist (the lineage-keeping production
    mode of datapipe.mat.materialize) must produce byte-identical
    results to the default checkpoint mode — exercised through
    curate_corpus, which routes marked/kmin/reps through materialize."""
    from rrdtool_1_x_spark.datapipe.pipeline import curate_corpus

    rows = [(i, f"doc body number {i} with enough words to pass") for i in range(30)]
    rows += [(100 + i, "an exact duplicate body repeated verbatim") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run():
        return sorted(
            (r["doc_id"], r["verdict"])
            for r in curate_corpus(docs, min_tokens=3).collect()
        )

    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE", raising=False)
    base = run()
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    assert run() == base


def test_vocab_coverage_hand_case(spark):
    from rrdtool_1_x_spark.datapipe.textstats import vocab_coverage

    # a:4, b:2, c:1 positions → top-1 covers 4/7, top-2 covers 6/7
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a a b")], "doc_id long, text string"
    )
    out = {r["k"]: r for r in vocab_coverage(df, ks=(1, 2, 10)).collect()}
    assert out[1]["covered"] == 4 and out[1]["total"] == 7
    assert out[2]["covered"] == 6
    assert out[10]["coverage"] == 1.0


def test_hits_bipartite_authority_ordering(spark):
    from rrdtool_1_x_spark.datapipe.graph import hits

    # hubs a,b,c all cite d1; only a cites d2 → d1 authority > d2;
    # a links both authorities → best hub
    edges = spark.createDataFrame(
        [("a", "d1", 1), ("b", "d1", 1), ("c", "d1", 1), ("a", "d2", 1)],
        "src string, dst string, w long",
    )
    out = {r["node"]: r for r in hits(edges, n_iter=3).collect()}
    assert out["d1"]["auth_micro"] > out["d2"]["auth_micro"] > 0
    assert out["a"]["hub_micro"] > out["b"]["hub_micro"]
    assert out["b"]["hub_micro"] == out["c"]["hub_micro"]
    # pure hubs have no authority, pure authorities no hub score
    assert out["a"]["auth_micro"] == 0 and out["d1"]["hub_micro"] == 0
    # L1 normalization: each side sums to ~scale (integer floors only)
    assert 0.99 * 10**12 < sum(r["auth_micro"] for r in out.values()) <= 10**12


def test_hits_huge_weights_no_overflow(spark):
    from rrdtool_1_x_spark.datapipe.graph import hits

    # weights far beyond what a BIGINT product of micro-units allows:
    # the DECIMAL(38,0) carry must stay exact (no nulls, no negatives)
    edges = spark.createDataFrame(
        [("s1", "d1", 10**7), ("s2", "d1", 3 * 10**7), ("s2", "d2", 10**7)],
        "src string, dst string, w long",
    )
    out = {r["node"]: r for r in hits(edges, n_iter=3).collect()}
    assert all(r["hub_micro"] >= 0 and r["auth_micro"] >= 0 for r in out.values())
    assert out["d1"]["auth_micro"] > out["d2"]["auth_micro"]


def test_triangle_counts_hand_graphs(spark):
    from rrdtool_1_x_spark.datapipe.graph import triangle_counts

    # K4: every node has degree 3 and sits in C(3,2)=3 triangles
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    out = {r["node"]: r for r in triangle_counts(
        spark.createDataFrame(k4, "u string, v string")).collect()}
    assert all((r["degree"], r["triangles"]) == (3, 3) for r in out.values())

    # a path a-b-c has zero triangles; closing it (c-a) gives one each
    path = spark.createDataFrame([("a", "b"), ("b", "c")], "u string, v string")
    assert all(
        r["triangles"] == 0 for r in triangle_counts(path).collect()
    )
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "u string, v string"
    )
    assert all(
        r["triangles"] == 1 for r in triangle_counts(cyc).collect()
    )


def test_cocitation_edges_shared_source_only(spark):
    from rrdtool_1_x_spark.datapipe.graph import cocitation_edges

    links = spark.createDataFrame(
        [("s1", "d1", 1), ("s1", "d2", 1), ("s2", "d2", 1), ("s2", "d3", 1)],
        "src string, dst string, w long",
    )
    out = {(r["u"], r["v"]): r["n_src"] for r in cocitation_edges(links).collect()}
    # d1-d2 share s1; d2-d3 share s2; d1-d3 share nothing
    assert out == {("d1", "d2"): 1, ("d2", "d3"): 1}


def test_triangle_counts_matches_bruteforce_random(spark):
    import itertools
    import random

    from rrdtool_1_x_spark.datapipe.graph import triangle_counts

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(30)}
    )
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(
            spark.createDataFrame(edges, "u string, v string")
        ).collect()
    }
    eset = set(edges)
    want = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (
            tuple(sorted((a, b))) in eset
            and tuple(sorted((b, c))) in eset
            and tuple(sorted((a, c))) in eset
        ):
            for x in (a, b, c):
                want[x] += 1
    want = {n: t for n, t in want.items() if n in got}
    assert got == want


def test_pagerank_matches_pure_python_replay(spark):
    import random

    from rrdtool_1_x_spark.datapipe.graph import pagerank

    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(10)]
    raw = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(25)}
    edges = [(a, b, rng.randint(1, 5)) for a, b in raw if a != b]
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            spark.createDataFrame(edges, "src string, dst string, w long"),
            n_iter=5,
        ).collect()
    }
    # independent pure-python replay of the exact integer recurrence
    ns = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    N, SCALE = len(ns), 10**12
    out = {}
    for a, _, w in edges:
        out[a] = out.get(a, 0) + w
    r = {n: SCALE // N for n in ns}
    for _ in range(5):
        inflow = {n: 0 for n in ns}
        for a, b, w in edges:
            inflow[b] += (r[a] * w) // out[a]
        dang = sum(r[n] for n in ns if n not in out)
        r = {
            n: (15 * (SCALE // N)) // 100
            + (85 * inflow[n]) // 100
            + (85 * (dang // N)) // 100
            for n in ns
        }
    assert got == r


def test_pagerank_resume_converges_to_cold_ranks(spark):
    from rrdtool_1_x_spark.datapipe.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 2), ("c", "a", 1), ("a", "c", 3)],
        "src string, dst string, w long",
    )
    # resume from a converged state: extra rounds barely move the ranks
    cold = pagerank(edges, n_iter=12)
    resumed = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edges, n_iter=2, init_ranks=cold).collect()
    }
    coldm = {r["node"]: r["rank_micro"] for r in cold.collect()}
    for n in coldm:
        assert abs(resumed[n] - coldm[n]) < 0.01 * coldm[n] + 1000
    # a brand-new node (edge append) enters at the uniform base and
    # picks up rank from its in-edges within the resumed rounds
    grown = edges.union(
        spark.createDataFrame([("a", "d", 5)], "src string, dst string, w long")
    )
    res2 = {
        r["node"]: r["rank_micro"]
        for r in pagerank(grown, n_iter=2, init_ranks=cold).collect()
    }
    assert "d" in res2 and res2["d"] > 0


def test_hyperball_harmonic_star_and_chain(spark):
    from rrdtool_1_x_spark.datapipe.graph import hyperball_harmonic

    # star into hub: hub is reached by 3 nodes at distance 1 → its
    # harmonic ≈ 3; leaves are reached by nobody → ≈ 0
    star = spark.createDataFrame(
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1)],
        "src string, dst string, w long",
    )
    out = {r["node"]: r for r in hyperball_harmonic(star, n_iter=3).collect()}
    assert out["hub"]["harmonic"] > 2.0
    assert all(abs(out[n]["harmonic"]) < 0.5 for n in "abc")
    # reach includes self: leaves ≈ 1, hub ≈ 4 (HLL estimate, small-range)
    assert out["hub"]["reach_est"] > out["a"]["reach_est"]

    # chain a→b→c: c gets 1/1 (from b) + 1/2 (from a) ≈ 1.5
    chain = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, w long"
    )
    oc = {r["node"]: r for r in hyperball_harmonic(chain, n_iter=3).collect()}
    assert oc["c"]["harmonic"] > oc["b"]["harmonic"] > oc["a"]["harmonic"]
    assert 1.0 < oc["c"]["harmonic"] < 2.1


def test_cdc_blocks_realign_after_insertion(spark):
    from rrdtool_1_x_spark.datapipe.dedup import cdc_blocks, cdc_dedup_report

    base = " ".join(f"w{i}" for i in range(120))
    shifted = "XX " + base  # one token inserted at the front
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    b = cdc_blocks(df).collect()
    h1 = {r["block_hash"] for r in b if r["doc_id"] == 1}
    h2 = {r["block_hash"] for r in b if r["doc_id"] == 2}
    # content-defined boundaries re-align: most of doc 1's blocks
    # reappear verbatim in the shifted copy (fixed-size chunking shares 0)
    assert len(h1 & h2) >= len(h1) // 2
    rep = cdc_dedup_report(df).collect()[0]
    assert rep["total_blocks"] > rep["distinct_blocks"]
    assert 0 < rep["dup_token_share"] < 1
    # token conservation: every token lands in exactly one block
    assert sum(r["n_tok"] for r in b) == 120 + 121


def test_winnow_fingerprints_match_reference_and_guarantee(spark):
    """The Spark winnowing equals a direct Python transcription of the
    SIGMOD 2003 algorithm (rightmost-min per window), and the paper's
    guarantee holds: an 11-token shared run (>= w + k - 1 = 7) yields a
    shared fingerprint; an unrelated doc shares none; a doc shorter
    than k + w - 1 grams' worth of tokens yields no fingerprints."""
    import hashlib

    from rrdtool_1_x_spark.datapipe.textstats import (
        winnow_fingerprints,
        winnow_overlap,
    )

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(text, k=4, w=4):
        toks = text.lower().strip().split()
        hs = [
            h60(" ".join(toks[i : i + k]))
            for i in range(len(toks) - k + 1)
        ]
        sel = set()
        for i in range(len(hs) - w + 1):
            best_h, best_p = 1 << 60, -1
            for j in range(w):
                if hs[i + j] <= best_h:
                    best_h, best_p = hs[i + j], i + j
            sel.add((best_p, best_h))
        return sel

    texts = [
        (1, "the quick brown fox jumps over the lazy dog and runs far"
            " away home"),
        (2, "completely different words here but the quick brown fox"
            " jumps over the lazy dog appears inside"),
        (3, "nothing in common with anybody else at all whatsoever"
            " truly unique content"),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for did, text in texts:
        assert got.get(did, set()) == ref(text), f"doc {did}"
    assert 4 not in got  # below k+w-1 tokens -> no full window
    ov = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap(df, min_shared=1).collect()
    }
    assert (1, 2) in ov
    assert not any(3 in p or 4 in p for p in ov)


def test_ngram_f1_pairs_clipping_and_edges(spark):
    """Clipped counting: a phrase repeated 3x on one side matches at most
    its count on the other; empty/short sides score 0; identical texts
    score 1.0."""
    from rrdtool_1_x_spark.datapipe.textstats import ngram_f1_pairs

    pairs = spark.createDataFrame(
        [
            # identical: P = R = F1 = 1
            (1, "a b c d", 1, "a b c d"),
            # 'x y' 3x vs 1x -> clipped match 1 (+ 'y x' twice unmatched)
            (2, "x y x y x y", 2, "x y z"),
            # short side (1 token -> no bigram)
            (3, "a b c", 3, "a"),
            # no overlap at all
            (4, "a b c", 4, "p q r"),
        ],
        "id_a long, text_a string, id_b long, text_b string",
    )
    got = {r["id_a"]: r for r in ngram_f1_pairs(pairs, n=2).collect()}
    assert (got[1]["precision"], got[1]["recall"], got[1]["f1"]) == (
        1.0, 1.0, 1.0,
    )
    r2 = got[2]
    # side a bigrams: x y, y x, x y, y x, x y (5); side b: x y, y z (2)
    assert (r2["ngrams_a"], r2["ngrams_b"], r2["n_match"]) == (5, 2, 1)
    assert r2["precision"] == 0.2 and r2["recall"] == 0.5
    assert (got[3]["ngrams_b"], got[3]["f1"]) == (0, 0.0)
    assert (got[4]["n_match"], got[4]["f1"]) == (0, 0.0)


def test_source_kl_closed_form_matches_brute_force(spark):
    """The absent-token closed form equals the brute-force sum over the
    FULL corpus vocabulary (computed in Python with the same micro-nat
    quantized logs), a corpus-like group scores near zero, and a
    vocabulary-disjoint group scores far higher."""
    import math
    from collections import Counter

    from rrdtool_1_x_spark.datapipe.textstats import source_kl_divergence

    rows = [
        (1, "mix", "alpha beta gamma delta alpha beta"),
        (2, "mix", "gamma delta epsilon zeta alpha beta"),
        (3, "same", "alpha beta gamma delta epsilon zeta"),
        (4, "skew", "omega omega omega psi psi chi"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in source_kl_divergence(df).collect()}

    # brute force with identical conventions
    toks = {s: [] for _, s, _ in rows}
    for _, s, t in rows:
        toks[s] += t.split()
    corpus = Counter(sum(toks.values(), []))
    V = len(corpus)
    N = sum(corpus.values())
    L = lambda x: round(math.log(x) * 1e6)
    for src_name, tk in toks.items():
        g = Counter(tk)
        ng = sum(g.values())
        micro = 0
        for t in corpus:
            c = g.get(t, 0)
            micro += (c + 1) * (
                L(c + 1) - L(ng + V) - L(corpus[t] + 1) + L(N + V)
            )
        r = got[src_name]
        assert r["kl_micro"] == micro, (src_name, r["kl_micro"], micro)
        assert r["n_tokens"] == ng and r["vocab_overlap"] == len(g)
    assert got["skew"]["kl"] > got["same"]["kl"]
    assert abs(got["same"]["kl"]) < 0.2


def test_ranking_metrics_hand_case(spark):
    """Hand-checked MRR/NDCG: approx list with relevant items at ranks
    2 and 5 of an exact top-3 -> recall 2/3, MRR 1/2, NDCG =
    (d2 + d5) / (d1 + d2 + d3) with the inlined micro-unit discounts;
    a query with no hits scores 0/0.0/0.0."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        _ndcg_discounts,
        ranking_metrics,
    )

    d = _ndcg_discounts(10)
    approx = spark.createDataFrame(
        [(1, 100 + r, r) for r in range(1, 11)]
        + [(2, 300 + r, r) for r in range(1, 11)],
        "query_id long, vec_id long, rank int",
    )
    # exact top-3 for q1: 102 (approx rank 2), 105 (rank 5), 999 (missed)
    exact = spark.createDataFrame(
        [(1, 102, 1), (1, 105, 2), (1, 999, 3),
         (2, 900, 1), (2, 901, 2)],
        "query_id long, vec_id long, rank int",
    )
    got = {r["query_id"]: r for r in ranking_metrics(approx, exact).collect()}
    r1 = got[1]
    assert (r1["n_exact"], r1["n_hit"]) == (3, 2)
    assert r1["recall_at_k"] == round(2 / 3, 6)
    assert r1["mrr_at_k"] == 0.5
    assert r1["ndcg_at_k"] == round((d[1] + d[4]) / (d[0] + d[1] + d[2]), 6)
    r2 = got[2]
    assert (r2["n_hit"], r2["mrr_at_k"], r2["ndcg_at_k"]) == (0, 0.0, 0.0)


def test_kn_heldout_backoff_and_oov(spark):
    """Held-out KN: an unseen (w1,w2) pair whose words the model knows
    scores through the pure backoff term; a bigram with an unknown word
    lands in oov_bigrams, not the mean; self-trained output schema is
    unchanged."""
    import math

    from rrdtool_1_x_spark.datapipe.textstats import kneser_ney_bigram

    train = spark.createDataFrame(
        [(1, "a b a c b c"), (2, "a b c a")], "doc_id long, text string"
    )
    # val doc: "b a" unseen as a pair (train has a-b, b-a? train pairs:
    # a-b, b-a(no: 'a b a c b c' -> a-b, b-a, a-c, c-b, b-c; 'a b c a'
    # -> a-b, b-c, c-a). So b-a IS seen. Use "c c": unseen pair, both
    # words known. "a z": z unknown -> oov.
    val = spark.createDataFrame(
        [(10, "c c a z")], "doc_id long, text string"
    )
    out = kneser_ney_bigram(val, train_df=train).collect()[0]
    # pairs of val doc: (c,c) unseen-pair backoff, (c,a) seen, (a,z) oov
    assert out["bigram_cnt"] == 2 and out["oov_bigrams"] == 1
    # recompute expected: model from train pairs
    from collections import Counter

    tp = Counter()
    for t in ["a b a c b c", "a b c a"]:
        w = t.split()
        for x, y in zip(w, w[1:]):
            tp[(x, y)] += 1
    c1 = Counter(); fanout = Counter(); fanin = Counter()
    for (x, y), c in tp.items():
        c1[x] += c; fanout[x] += 1; fanin[y] += 1
    B = len(tp)
    D = 0.75

    def lp(x, y):
        p = max(tp.get((x, y), 0) - D, 0) / c1[x] + (
            D * fanout[x] / c1[x]
        ) * (fanin[y] / B)
        return round(math.log(p) * 1e6)

    want = round((lp("c", "c") + lp("c", "a")) / 2 / 1e6, 6)
    assert round(out["kn_logprob"], 6) == want
    # self-trained schema untouched
    st = kneser_ney_bigram(train).columns
    assert st == ["doc_id", "kn_logprob", "bigram_cnt"]


def test_unigram_tokenizer_trains_merges_and_segments(spark):
    """Viterbi-EM unigram tokenizer: on an 'ab'-dominated corpus the
    piece 'ab' survives training and wins segmentation over single
    chars; every word stays segmentable (char fallback, incl. rare
    chars); EM cannot decrease the corpus Viterbi likelihood; the doc
    stats are consistent."""
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.unigram_tok import (
        train_unigram,
        unigram_doc_stats,
        viterbi_segment,
        word_frame,
        _scores,
        seed_vocab,
    )

    rows = [(i, "ababab abab xyz q") for i in range(30)] + [
        (100, "zz")  # rare chars: must stay segmentable
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_unigram(
        docs, max_piece=3, seed_size=64, vocab_size=16, n_iter=2
    )
    pieces = {p for p, _, _ in model}
    assert "ab" in pieces
    # char fallback: every char of the corpus present
    for ch in "abxyzq":
        assert ch in pieces
    # best segmentation of 'ababab' uses 'ab' (or larger), not 6 chars
    scores = {p: s for p, _, s in model}
    words = word_frame(docs)
    seg = {
        r["word"]: r
        for r in viterbi_segment(words, scores, max_piece=3).collect()
    }
    assert seg["ababab"]["n_pieces"] <= 3
    assert "ab" in seg["ababab"]["seg"].split(" ")
    assert seg["zz"]["seg"] is not None  # rare word segmentable
    # EM monotonicity on corpus likelihood: score under iter-2 model >=
    # score under seed scores (both over the same words, freq-weighted)
    s0 = _scores(seed_vocab(words, 3, 64))
    lik0 = sum(
        r["score"] * r["freq"]
        for r in viterbi_segment(words, s0, 3).collect()
    )
    lik2 = sum(
        r["score"] * r["freq"]
        for r in viterbi_segment(words, scores, 3).collect()
    )
    assert lik2 >= lik0
    st = {r["doc_id"]: r for r in unigram_doc_stats(docs, model).collect()}
    r0 = st[0]
    assert r0["n_words"] == 4 and r0["n_pieces"] >= r0["n_words"]
    assert r0["logp_micro_sum"] < 0
    assert st[100]["n_words"] == 1


def test_lsh_precision_recall_planted_corpus(spark):
    """Banding audit on a planted corpus: near-identical pairs land in
    the truth set AND the candidate set (recall 1 here — tiny corpus,
    identical 2/3 of shingles); unrelated docs produce no false truth;
    exact copies are collapsed out of both sides."""
    from rrdtool_1_x_spark.datapipe.dedup import lsh_precision_recall

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1
        (3, base),                     # exact copy of 1 -> collapsed
        (4, "one two three four five six seven eight nine ten"),
        (5, "completely different words without any overlap here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = lsh_precision_recall(
        df, num_hashes=8, bands=4, shingle_len=3,
        jaccard_threshold=0.5,
    ).collect()[0]
    # truth: only (1,2); doc 3 collapsed into 1
    assert r["n_truth"] == 1
    assert r["n_hit"] == 1 and r["recall"] == 1.0
    assert r["n_candidates"] >= 1
    assert 0.0 < r["precision"] <= 1.0
    assert r["theory_recall_at_t"] == round(1 - (1 - 0.5**2) ** 4, 6)


def test_corpus_diff_hand_case(spark):
    from rrdtool_1_x_spark.datapipe.report import corpus_diff

    old = spark.createDataFrame(
        [(1, "a", "one"), (2, "a", "two"), (3, "b", "three")],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "one"),        # unchanged
            (2, "b", "two CHANGED"),  # changed AND re-sourced -> new group
            (4, "b", "four"),       # added
        ],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in corpus_diff(old, new).collect()}
    assert got["a"]["n_unchanged"] == 1 and got["a"]["n_removed"] == 0
    # changed doc counts under its NEW source; removed under the old
    assert got["b"]["n_changed"] == 1 and got["b"]["n_added"] == 1
    assert got["b"]["n_removed"] == 1  # doc 3


def test_script_mix_homoglyph_and_dominance(spark):
    from rrdtool_1_x_spark.datapipe.textstats import script_mix

    rows = [
        (1, "hello world plain latin"),
        (2, "привет мир"),
        (3, "hellо wоrld"),   # Cyrillic о homoglyphs
        (4, "12345 .,!"),                # no scripted chars
        (5, "你好世界"),  # CJK
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_mix(df).collect()}
    assert got[1]["dominant_script"] == "latin" and got[1]["mixed_flag"] == 0
    assert got[2]["dominant_script"] == "cyrillic"
    r3 = got[3]
    assert (r3["dominant_script"], r3["mixed_flag"]) == ("latin", 1)
    assert r3["cyrillic_cnt"] == 2
    assert got[4]["dominant_script"] is None and got[4]["scripted_cnt"] == 0
    assert got[5]["dominant_script"] == "cjk"


def test_corpus_diff_null_text_is_presence_not_hash(spark):
    """A NULL text still EXISTS in its snapshot: NULL->value and
    value->NULL classify as changed (never added/removed); NULL->NULL
    is unchanged (null-safe compare)."""
    from rrdtool_1_x_spark.datapipe.report import corpus_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "a", "two"), (3, "a", None)],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [(1, "a", "now set"), (2, "a", None), (3, "a", None)],
        "doc_id long, source string, text string",
    )
    r = corpus_diff(old, new).collect()[0]
    assert (r["n_added"], r["n_removed"]) == (0, 0)
    assert r["n_changed"] == 2 and r["n_unchanged"] == 1


def test_viterbi_nbest_order_and_distinctness(spark):
    """2-best segmentations: rank 1 equals the 1-best Viterbi result,
    rank 2 is a strictly different segmentation with score <= rank 1,
    and a single-char-only word has exactly one segmentation."""
    from rrdtool_1_x_spark.datapipe.unigram_tok import (
        viterbi_nbest,
        viterbi_segment,
    )

    words = spark.createDataFrame(
        [("abab", 3), ("q", 1)], "word string, freq long"
    )
    scores = {"a": -100, "b": -120, "ab": -150, "q": -50}
    nb = {}
    for r in viterbi_nbest(words, scores, max_piece=2, nbest=2).collect():
        nb.setdefault(r["word"], []).append((r["rank"], r["seg"], r["score"]))
    one = {
        r["word"]: (r["seg"], r["score"])
        for r in viterbi_segment(words, scores, max_piece=2).collect()
    }
    for w, rows in nb.items():
        rows.sort()
        assert (rows[0][1], rows[0][2]) == one[w]
        if len(rows) > 1:
            assert rows[1][1] != rows[0][1]
            assert rows[1][2] <= rows[0][2]
    # abab best: 'ab ab' (-300) beats 'a b a b' (-440) etc.
    assert nb["abab"][0][1] == "ab ab" and nb["abab"][0][2] == -300
    # second best: replace one 'ab' with 'a b': score -370; tie between
    # 'a b ab' and 'ab a b' -> lexicographic smaller wins rank 2
    assert nb["abab"][1] == (2, "a b ab", -370)
    assert len(nb["q"]) == 1 and nb["q"][0][1] == "q"


def test_exact_substring_spans_extents_and_merge(spark):
    """Variable-length exact-repeat extents (Lee et al. 2022 ExactSubstr
    tier): a 15-token passage shared by two documents reports as ONE
    maximal span per document at its exact (start, len); a longer shared
    passage merges into one extent (never fixed-n fragments); a within-
    document self-repeat reports both copies; sub-n docs and sub-n
    repeats report nothing."""
    from rrdtool_1_x_spark.datapipe.dedup import exact_substring_spans

    p = " ".join(f"p{i}" for i in range(15))
    rows = [
        (1, "u1 u2 u3 " + p + " s1 s2"),
        (2, "v1 " + p + " w1 w2 w3 w4"),
        # 10-token text repeated within one doc: anchors 1 and 11 only
        (3, "a b c d e f g h i j a b c d e f g h i j"),
        # shares only a 9-token (sub-n) prefix of p with docs 1/2
        (4, " ".join(f"p{i}" for i in range(9)) + " x1 x2 x3 x4 x5"),
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in exact_substring_spans(df, n=10).collect()
    }
    assert got == {(1, 4, 15), (2, 2, 15), (3, 1, 10), (3, 11, 10)}
    # adjacent DISTINCT repeats do NOT fuse: doc 6 chains p's copy with
    # doc 7's 12-token passage q back-to-back, but the windows straddling
    # the p|q seam occur nowhere else, so each passage keeps its own
    # exact extent (fusion needs the combined string itself to repeat)
    q = " ".join(f"q{i}" for i in range(12))
    df2 = spark.createDataFrame(
        rows + [(6, p + " " + q), (7, "z1 z2 " + q + " z3")],
        "doc_id long, text string",
    )
    got2 = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in exact_substring_spans(df2, n=10).collect()
    }
    assert (6, 1, 15) in got2 and (6, 16, 12) in got2
    assert (7, 3, 12) in got2
    # hash_fn variants agree on the span set
    got_xx = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in exact_substring_spans(df2, n=10, hash_fn="xxhash64").collect()
    }
    assert got_xx == got2


def test_langid_nb_beats_stopword_heuristic(spark):
    """Trained char-trigram NB language ID separates planted
    transliteration-style pseudo-languages (shared whitespace
    vocabulary, per-language char mapping) with >= 0.95 accuracy, while
    the stopword heuristic tier cannot (no stopword list matches the
    translated scripts) — the pin that the trained tier actually learns
    from characters rather than riding the heuristic's signal."""
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.textstats import (
        langid_nb,
        language_scores,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = F.lower(F.trim(F.col("text")))
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, s)
        .when(F.col("doc_id") % 3 == 1, F.translate(s, "aeiou", "äëïöü"))
        .otherwise(F.translate(s, "aeiount", "аеиоунт"))
        .alias("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("lat"))
        .when(F.col("doc_id") % 3 == 1, F.lit("uml"))
        .otherwise(F.lit("cyr"))
        .alias("lang"),
    )
    train = planted.filter(F.col("doc_id") % 7 == 0)
    test = planted.filter(F.col("doc_id") % 7 != 0)
    res = langid_nb(train, test).collect()
    acc = sum(r["correct"] for r in res) / len(res)
    assert acc >= 0.95, acc
    # heuristic tier: en stopwords survive only in the identity-mapped
    # class; treat a correct call as guessing SOME language for 'lat'
    # rows only (the most charitable mapping) — still far below NB
    heur = language_scores(
        test.select("doc_id", "text", "lang")
    ).select("lang", "lang_guess").collect()
    heur_acc = sum(
        1 for r in heur if r["lang"] == "lat" and r["lang_guess"] is not None
    ) / len(heur)
    assert heur_acc <= 0.5, heur_acc
    assert acc > heur_acc + 0.4
    # empty-text doc predicts NULL, never crashes
    one = spark.createDataFrame(
        [(1000000, "", "lat")], "doc_id long, text string, lang string"
    )
    r = langid_nb(train, one).collect()[0]
    assert r["pred"] is None and r["correct"] == 0


def test_anchor_index_union_merge_law(spark, tmp_path):
    """Suffix-dedup anchor index: index-then-append equals the one-shot
    extents EXACTLY for any batch split (set-union merge law), replayed
    appends are absorbed by the read-side distinct, and cross-batch
    repeats are discovered (a passage indexed in batch 1 whose twin
    arrives in batch 2 reports in BOTH docs)."""
    from rrdtool_1_x_spark.datapipe.dedup import (
        anchor_index_spans,
        append_anchor_index,
        exact_substring_spans,
        write_anchor_index,
    )

    p = " ".join(f"p{i}" for i in range(15))
    rows = [
        (1, "u1 u2 u3 " + p + " s1 s2"),
        (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
        (3, "v1 " + p + " x1 x2 x3 x4"),
        (4, "a b c d e f g h i j a b c d e f g h i j"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        tuple(r) for r in exact_substring_spans(df, n=10).collect()
    }
    idx = str(tmp_path / "idx")
    # batch 1 holds one copy of p, batch 2 brings its twin
    write_anchor_index(df.filter("doc_id <= 2"), idx, n=10)
    append_anchor_index(df.filter("doc_id > 2"), idx, n=10)
    got = {tuple(r) for r in anchor_index_spans(spark, idx, n=10).collect()}
    assert got == want and (1, 4, 15) in got and (3, 2, 15) in got
    # replayed append: duplicates absorbed, extents unchanged
    append_anchor_index(df.filter("doc_id > 2"), idx, n=10)
    got2 = {tuple(r) for r in anchor_index_spans(spark, idx, n=10).collect()}
    assert got2 == want


def test_canary_scan_counts_and_shape(spark):
    """Exact canary screen: per-(doc, canary) hit rows with exact
    occurrence counts; overlapping canaries count independently; docs
    without canaries emit nothing; empty canary rejected."""
    import pytest as _pytest

    from rrdtool_1_x_spark.datapipe.decontam import canary_scan

    c1, c2 = "canary-aaa", "canary-bbb"
    rows = [
        (1, f"text with {c1} inside"),
        (2, f"{c2} twice {c2} here"),
        (3, "clean document"),
        (4, f"{c1} and {c2} both"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["canary"]): r["n_hits"]
        for r in canary_scan(df, [c1, c2]).collect()
    }
    assert got == {(1, c1): 1, (2, c2): 2, (4, c1): 1, (4, c2): 1}
    with _pytest.raises(ValueError):
        canary_scan(df, [])
    with _pytest.raises(ValueError):
        canary_scan(df, [c1, ""])


def test_soft_dedup_weights_component_math(spark):
    """SoftDeDup: component members share weight = 1000000 DIV size,
    singletons (no pair) get their own group at full weight, and the
    per-component weight mass sums to ~1e6 (the keep-information
    invariant hard dedup lacks)."""
    from rrdtool_1_x_spark.datapipe.dedup import soft_dedup_weights

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["group_id"], r["group_size"], r["weight"])
        for r in soft_dedup_weights(docs, pairs).collect()
    }
    assert got[0] == (0, 3, 333333)
    assert got[1] == (0, 3, 333333) and got[2] == (0, 3, 333333)
    assert got[3] == (3, 1, 1000000)
    assert got[4] == (4, 2, 500000) and got[5] == (4, 2, 500000)


def test_excise_duplicate_extents_removes_all_copies(spark):
    """Lee et al. ExactSubstr EXCISION: every maximal >= n-token repeat
    is cut from EVERY occurrence (no canonical copy, unlike the
    fixed-window remove_duplicate_spans), surviving tokens re-join, and
    token conservation holds: n_tokens - removed_tokens tokens remain.
    Untouched and too-short documents pass through unchanged."""
    from rrdtool_1_x_spark.datapipe.dedup import (
        exact_substring_spans,
        excise_duplicate_extents,
    )

    p = " ".join(f"p{i}" for i in range(12))
    rows = [
        (1, "u1 u2 " + p + " t1 t2"),        # copy 1 of p
        (2, "w1 " + p + " w2 w3"),           # copy 2 of p
        (3, "clean c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"),
        (4, "a b c d e f g h i j a b c d e f g h i j"),  # self-repeat
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in excise_duplicate_extents(df, n=10).collect()
    }
    # both copies of p excised; neighbours survive
    assert out[1]["text"] == "u1 u2 t1 t2"
    assert out[2]["text"] == "w1 w2 w3"
    assert out[1]["removed_tokens"] == 12 and out[2]["removed_tokens"] == 12
    # the self-repeat doc is one maximal duplicated extent -> empty
    assert out[4]["text"] == "" and out[4]["removed_tokens"] == 20
    # untouched docs pass through (lowercased token join)
    assert out[3]["text"].startswith("clean c1") and out[3]["removed_tokens"] == 0
    assert out[5]["text"] == "short doc"
    # token conservation on every row
    for r in out.values():
        survivors = len(r["text"].split()) if r["text"] else 0
        assert r["n_tokens"] - r["removed_tokens"] == survivors, r
    # precomputed-spans path (the anchor-index composition) is identical
    spans = exact_substring_spans(df, n=10)
    out2 = {
        r["doc_id"]: tuple(r)
        for r in excise_duplicate_extents(df, n=10, spans=spans).collect()
    }
    assert out2 == {k: tuple(v) for k, v in out.items()}


def test_suffix_coverage_count_skew_hardened(spark):
    """The suffix-tier coverage count must be a groupBy + semi-join,
    never a per-hash window: a planted mega-boilerplate run (one
    12-gram shared by every document) makes one hash carry every
    occurrence — a window would pin them all to a single task that AQE
    cannot split. Plan-asserted (no window over _h) and value-checked
    on the planted corpus."""
    from rrdtool_1_x_spark.datapipe.dedup import (
        _anchor_occurrences,
        _extents_from_occurrences,
        exact_substring_spans,
    )

    boiler = " ".join(f"b{i}" for i in range(12))
    n_docs = 3000
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("u"), F.col("id").cast("string"),
            F.lit(" " + boiler + " v"), F.col("id").cast("string"),
        ).alias("text"),
    )
    spans = exact_substring_spans(df, n=12)
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_h" not in plan.lower().replace(" ", "")
    # every doc reports exactly the boilerplate extent (positions 2..13)
    got = spans.collect()
    assert len(got) == n_docs
    assert all(r["span_start"] == 2 and r["span_len"] == 12 for r in got)
    # the shared reduce tail behaves the same off a stored occurrence set
    occ = _anchor_occurrences(df, 12, "doc_id", "text", "md5")
    got2 = _extents_from_occurrences(occ, 12).count()
    assert got2 == n_docs


def test_anchor_meta_pin_fs_and_ordering(spark, tmp_path):
    """anchor_meta.json: lives on the index's own filesystem (Hadoop
    FileSystem API — same scheme as the parquet anchors), is written
    AFTER a successful anchors write (a fresh append pins it too), and
    a mismatched (n, id_col, hash_fn) config raises instead of silently
    mixing anchor widths."""
    import os

    import pytest as _pytest

    from rrdtool_1_x_spark.datapipe.dedup import (
        _anchor_meta_read,
        anchor_index_spans,
        append_anchor_index,
        write_anchor_index,
    )

    rows = [(1, " ".join(f"t{i}" for i in range(14)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # fresh APPEND (no prior write) pins the config after the append
    idx1 = str(tmp_path / "idx1")
    append_anchor_index(df, idx1, n=10)
    assert os.path.exists(f"{idx1}/anchor_meta.json")
    assert _anchor_meta_read(spark, idx1) == {
        "n": 10, "id_col": "doc_id", "hash_fn": "md5"
    }
    # mismatched config refused on append AND on read
    with _pytest.raises(ValueError, match="written with"):
        append_anchor_index(df, idx1, n=12)
    with _pytest.raises(ValueError, match="written with"):
        append_anchor_index(df, idx1, n=10, hash_fn="xxhash64")
    with _pytest.raises(ValueError, match="written with"):
        anchor_index_spans(spark, idx1, n=12)

    # full rewrite replaces the pin along with the anchors
    write_anchor_index(df, idx1, n=12)
    assert _anchor_meta_read(spark, idx1)["n"] == 12
    assert anchor_index_spans(spark, idx1).count() == 0  # no repeats
