"""Unit tests for datapipe.sampling and datapipe.decontam.

The oracle-replay suite (test_entry_oracle.py) hash-gates these against
DuckDB; the tests here check the *properties* the modules promise:
determinism, append-stability, nesting, budget semantics, broadcast-side
correctness of the contamination join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.decontam import (
    contamination_pairs,
    decontaminate,
    vocab_top_ngrams,
)
from rrdtool_1_x_spark.datapipe.sampling import (
    hash_sample,
    hash_split,
    hash_u01,
    stratified_sample,
    token_budget_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_hash_split_deterministic_and_complete(docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    assert a == b  # reproducible
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()  # every row assigned exactly once
    # roughly proportional (loose bound — 50 docs at sf0.001)
    train = sum(1 for s in a.values() if s == "train")
    assert train > len(a) * 0.5


def test_hash_split_append_stable(docs):
    """Appending rows never reassigns existing ones: the split is a pure
    function of the id."""
    w = {"train": 0.9, "val": 0.1}
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_assign = {
        r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()
    }
    half_assign = {
        r["doc_id"]: r["split"] for r in hash_split(half, w).collect()
    }
    assert all(full_assign[k] == v for k, v in half_assign.items())


def test_hash_sample_nested(docs):
    """hash_sample(p1) ⊆ hash_sample(p2) for p1 < p2 with the same seed —
    the nested-subsets property scaling-law runs rely on."""
    s10 = {r["doc_id"] for r in hash_sample(docs, 0.1, seed="s").collect()}
    s50 = {r["doc_id"] for r in hash_sample(docs, 0.5, seed="s").collect()}
    assert s10 <= s50
    assert len(s50) < docs.count()


def test_hash_u01_range(docs):
    vals = [
        r["u"]
        for r in docs.select(hash_u01(F.col("doc_id")).alias("u")).collect()
    ]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) == len(vals)  # md5 over distinct ids: no collisions


def test_stratified_sample_sizes(docs):
    n = 5
    out = stratified_sample(docs, ["lang"], n)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {k: min(n, v) for k, v in avail.items()}
    # deterministic selection
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs, ["lang"], n).collect())
    assert a == b


def test_token_budget_semantics(docs):
    d = docs.withColumn(
        "token_cnt", F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    )
    budgets = {"en": 300, "de": 200}
    out = token_budget_sample(d, budgets, group_col="lang").cache()
    # groups absent from the budget map are dropped
    assert {r["lang"] for r in out.select("lang").distinct().collect()} <= set(budgets)
    # each group's kept tokens fit its budget
    sums = {
        r["lang"]: r["s"]
        for r in out.groupBy("lang").agg(F.sum("token_cnt").alias("s")).collect()
    }
    for lang, s in sums.items():
        assert s <= budgets[lang]
    # tokens_before is the running total excluding the row itself: the max
    # (tokens_before + token_cnt) per group equals the group's kept sum
    chk = out.groupBy("lang").agg(
        F.max(F.col("tokens_before") + F.col("token_cnt")).alias("m")
    )
    for r in chk.collect():
        assert r["m"] == sums[r["lang"]]
    # budget binds: the first *excluded* doc in hash order would overflow
    order_hash = F.md5(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string")).cast("binary")
    )
    en = (
        d.filter(F.col("lang") == "en")
        .select("doc_id", "token_cnt", order_hash.alias("_h"))
        .orderBy("_h", "doc_id")
        .collect()
    )
    kept_en = {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()}
    running = 0
    for r in en:
        running += r["token_cnt"]
        assert (r["doc_id"] in kept_en) == (running <= budgets["en"])


def test_contamination_pairs_and_decontaminate(docs):
    # benchmark = verbatim copies of 3 documents → each contaminates its
    # source with overlap_frac 1.0
    bench = (
        docs.orderBy("doc_id")
        .limit(3)
        .select((F.col("doc_id") + 900000).alias("bench_id"), "text")
    )
    pairs = contamination_pairs(docs, bench, n=8, min_overlap_frac=0.5).cache()
    got = {(r["doc_id"], r["bench_id"]): r for r in pairs.collect()}
    src_ids = [r["doc_id"] for r in docs.orderBy("doc_id").limit(3).collect()]
    for sid in src_ids:
        r = got[(sid, sid + 900000)]
        assert r["overlap_ngrams"] == r["bench_ngrams"]
        assert abs(r["overlap_frac"] - 1.0) < 1e-12
    clean = decontaminate(docs, bench, n=8, min_overlap_frac=0.5)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    contaminated = {k[0] for k in got}
    assert kept == {
        r["doc_id"] for r in docs.collect()
    } - contaminated
    assert set(src_ids) <= contaminated


def test_vocab_top_ngrams(docs):
    out = vocab_top_ngrams(docs, n=1, k=10).collect()
    assert len(out) == 10
    freqs = [r["doc_freq"] for r in out]
    assert freqs == sorted(freqs, reverse=True)
    assert [r["rank"] for r in out] == list(range(1, 11))
    # document frequency, not raw count: a gram can appear at most once per doc
    assert max(freqs) <= docs.count()
    # per-group variant covers every group with its own ranking
    by = vocab_top_ngrams(docs, n=1, k=3, by="lang")
    sizes = {
        r["lang"]: r["n"]
        for r in by.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert set(sizes) == langs and all(v <= 3 for v in sizes.values())


def test_minhash_seeds_distinct(docs):
    """Regression for the F.transform two-parameter-lambda trap: a defaulted
    second lambda param makes PySpark bind the element INDEX over the seed,
    collapsing every sig column to the same hash function. On a corpus of
    multi-shingle docs the per-seed minima must differ for most docs."""
    from rrdtool_1_x_spark.datapipe.dedup import minhash_signatures

    sigs = minhash_signatures(docs, num_hashes=4).cache()
    n = sigs.count()
    same = sigs.filter(
        (F.col("sig0") == F.col("sig1"))
        & (F.col("sig1") == F.col("sig2"))
        & (F.col("sig2") == F.col("sig3"))
    ).count()
    # all-identical signatures across 4 independent hash families should be
    # essentially impossible on real text; the broken-seed bug makes it 100%
    assert same < n * 0.1


def test_pack_sequences_hand_case(spark):
    """Hand-packed stream: docs of 3/5/2 tokens + 1 EOD each, seq_len 4:
    stream offsets 0/4/10; seq windows [0,4) [4,8) [8,12).
    doc a (3 tok @0) -> seq 0 pos 0 tok [0,3)
    doc b (5 tok @4) -> seq 1 pos 0 tok [0,4); seq 2 pos 0 tok [4,5)
    doc c (2 tok @10) -> seq 2 pos 2 tok [0,2)
    """
    from rrdtool_1_x_spark.datapipe.sampling import pack_sequences

    rows = [(1, "a b c"), (2, "t u v w x"), (3, "y z"), (4, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.seq_idx, r.doc_id): (r.tok_from, r.tok_to, r.pos_in_seq, r.n_tokens)
        for r in pack_sequences(df, seq_len=4).collect()
    }
    assert out == {
        (0, 1): (0, 3, 0, 3),
        (1, 2): (0, 4, 0, 5),
        (2, 2): (4, 5, 0, 5),
        (2, 3): (0, 2, 2, 2),
    }  # the empty doc 4 emits nothing


def test_pack_sequences_properties(spark):
    """Invariants over a corpus: every sequence slot holds at most
    seq_len tokens; pieces of one doc are contiguous and complete; the
    sharded variant packs each shard independently."""
    from rrdtool_1_x_spark.datapipe.sampling import pack_sequences
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, seq_len=128).cache()
    per_seq = out.groupBy("seq_idx").agg(
        F.sum(F.col("tok_to") - F.col("tok_from")).alias("fill")
    )
    assert per_seq.filter("fill > 128").count() == 0
    per_doc = out.groupBy("doc_id", "n_tokens").agg(
        F.sum(F.col("tok_to") - F.col("tok_from")).alias("covered"),
        F.min("tok_from").alias("mn"), F.max("tok_to").alias("mx"),
    )
    bad = per_doc.filter("covered != n_tokens OR mn != 0 OR mx != n_tokens")
    assert bad.count() == 0

    sharded = pack_sequences(docs, seq_len=128, shard_col="lang")
    # within each shard the same completeness holds
    per_doc_s = sharded.groupBy("doc_id", "n_tokens").agg(
        F.sum(F.col("tok_to") - F.col("tok_from")).alias("covered")
    )
    assert per_doc_s.filter("covered != n_tokens").count() == 0
    assert "lang" in sharded.columns


def test_pack_sequences_default_never_plans_single_partition(spark):
    """The scale contract for the default (global-identity) path: the
    stream offset is a two-level distributed prefix-sum, so the physical
    plan must contain NO SinglePartition exchange — the footgun this
    replaces was a Window.partitionBy() global cumsum that planned a
    one-task WindowExec over the whole corpus."""
    from rrdtool_1_x_spark.datapipe.sampling import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, seq_len=128)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_pack_sequences_default_matches_driver_cumsum(spark):
    """The distributed prefix-sum must reproduce the sequential global
    cumsum bit-for-bit (global stream identity is the default's whole
    point)."""
    from rrdtool_1_x_spark.datapipe.sampling import pack_sequences
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = (
        docs.select(
            "doc_id",
            F.when(F.trim("text") == "", F.lit(0))
            .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
            .cast("long")
            .alias("n"),
        )
        .orderBy("doc_id")
        .collect()
    )
    off, expect = 0, {}
    for r in toks:
        expect[r.doc_id] = off
        off += r.n + 1  # eod_tokens=1
    out = pack_sequences(docs, seq_len=128)
    # derive each doc's stream offset back from its first piece:
    # offset = seq_idx*seq_len + pos_in_seq at tok_from==0
    got = {
        r.doc_id: r.seq_idx * 128 + r.pos_in_seq
        for r in out.filter("tok_from = 0").collect()
    }
    assert got == {d: o for d, o in expect.items()
                   if d in got}  # zero-token docs emit no rows
    # and every non-empty doc is present
    assert set(got) == {r.doc_id for r in toks if r.n > 0}


def test_split_leakage_detects_cross_split_copies(spark):
    from rrdtool_1_x_spark.datapipe.decontam import split_leakage

    body = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"
    rows = (
        [(i, body) for i in range(6)]            # exact-copy group
        + [(100, near)]                          # near-dup of the group rep
        + [(200 + i, f"unique text number {i} nothing shared") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage(df, {"train": 0.5, "val": 0.5}).collect()
    # the copy group spans both splits with overwhelming probability over
    # 6 ids; every reported pair must genuinely cross and be a real dup
    assert out, "expected cross-split duplicate pairs"
    for r in out:
        assert r["split_a"] != r["split_b"]
        assert r["id_a"] < r["id_b"]
        assert r["jaccard"] >= 0.5
    # member-level completeness: EVERY copy-group member appears in a
    # cross-split pair (a representative-only pairing would miss
    # member-member leaks like val-copy vs train-copy)
    exact = [r for r in out if r["jaccard"] == 1.0]
    assert exact
    paired = {r["id_a"] for r in exact} | {r["id_b"] for r in exact}
    from rrdtool_1_x_spark.datapipe.sampling import hash_split
    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, {"train": 0.5, "val": 0.5}).collect()
    }
    group = list(range(6))
    if len({splits[i] for i in group}) > 1:
        assert set(group) <= paired
    # no unique doc appears in any pair
    ids = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    assert not any(i >= 200 for i in ids)


def test_hll_distinct_accuracy_and_determinism(spark):
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import hll_distinct

    # 5000 distinct values with duplicates mixed in
    df = spark.range(15000).select(
        (F.col("id") % 5000).cast("string").alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    out = {
        r["g"]: r
        for r in hll_distinct(df, F.col("v"), ["g"], exact=True).collect()
    }
    for g, r in out.items():
        assert r["n_exact"] == 5000
        # 512 registers -> ~4.6% standard error; allow 4 sigma
        assert r["rel_err"] < 0.2, r
    # order/partitioning independence: repartitioned input, same estimate
    out2 = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(
            df.repartition(13, "v"), F.col("v"), ["g"], exact=True
        ).collect()
    }
    assert out2 == {g: r["hll_est"] for g, r in out.items()}
    # duplicates never move the estimate
    out3 = hll_distinct(
        df.filter(F.col("g") == "0").union(df.filter(F.col("g") == "0")),
        F.col("v"), ["g"],
    ).collect()[0]["hll_est"]
    assert out3 == out["0"]["hll_est"]


def test_hll_small_range_linear_counting(spark):
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import hll_distinct

    df = spark.range(40).select(F.col("id").cast("string").alias("v"))
    r = hll_distinct(df, F.col("v"), exact=True).collect()[0]
    # linear counting is near-exact at tiny cardinalities
    assert r["n_exact"] == 40 and abs(r["hll_est"] - 40) <= 3


def test_cms_never_undercounts_and_is_partition_independent(spark):
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import cms_estimate, cms_table

    # skewed stream: value k appears k times, k = 1..60
    df = spark.range(61).select(F.col("id")).filter("id > 0").select(
        F.explode(F.expr("sequence(1, id)")).alias("_"),
        F.col("id").cast("string").alias("v"),
    ).select("v")
    sketch = cms_table(df, F.col("v"))
    cand = df.groupBy("v").agg(F.count("*").alias("true_cnt"))
    out = cms_estimate(sketch, cand, "v").collect()
    assert len(out) == 60
    for r in out:
        assert r["cms_est"] >= r["true_cnt"]  # CM never undercounts
    # partitioning cannot change exact integer sums
    sketch2 = cms_table(df.repartition(17), F.col("v"))
    a = {(r["d"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    b = {(r["d"], r["bucket"]): r["cnt"] for r in sketch2.collect()}
    assert a == b


def test_bloom_probe_no_false_negatives_and_filters(spark):
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import bloom_bits, bloom_probe

    members = spark.range(200).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    others = spark.range(5000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("v")
    )
    bits = bloom_bits(members, F.col("v"))
    # every member passes (no false negatives)
    assert members.filter(bloom_probe("v", bits)).count() == 200
    # false-positive rate at n=200, m=65536, k=4 is ~1e-8 — essentially
    # all non-members rejected map-side
    fp = others.filter(bloom_probe("v", bits)).count()
    assert fp <= 2


def test_bloom_contamination_matches_exact(spark):
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.decontam import (
        bloom_contamination_pairs,
        contamination_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    cols = ["doc_id", "bench_id", "overlap_ngrams", "bench_ngrams"]
    a = sorted(tuple(r) for r in contamination_pairs(docs, bench)
               .select(*cols).collect())
    b = sorted(tuple(r) for r in bloom_contamination_pairs(docs, bench)
               .select(*cols).collect())
    assert a == b and len(a) > 0


def test_split_leakage_member_member_exact_copies(spark):
    """The review scenario: copies {0:test-ish, 1:test-ish, 2:train-ish}
    must report BOTH cross pairs, not just the representative's."""
    from rrdtool_1_x_spark.datapipe.decontam import split_leakage
    from rrdtool_1_x_spark.datapipe.sampling import hash_split

    body = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame(
        [(i, body) for i in range(12)], "doc_id long, text string"
    )
    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, {"a": 0.5, "b": 0.5}).collect()
    }
    out = split_leakage(df, {"a": 0.5, "b": 0.5}).collect()
    paired = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    # every member of the (split-spanning) group must be witnessed
    if len(set(splits.values())) > 1:
        assert paired == set(range(12))
    for r in out:
        assert splits[r["id_a"]] != splits[r["id_b"]]


def test_hll_estimate_branches_on_crafted_registers(spark):
    """Drive the ACTUAL Spark estimate expression (sketch._hll_est_col)
    through all three branches via crafted register summaries: linear
    counting, large-range correction, and the saturated-sketch clamp
    (which must NOT feed ln() a non-positive argument)."""
    import math

    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import _hll_est_col

    alpha = 0.7213 / (1 + 1.079 / 512)
    # (name, nb, K, S) register summaries
    rows = [
        ("linear", 40, 1, 80),        # tiny: V=472 > 0, e_raw small
        ("midrange", 512, 10, 2048),  # no empties, below the switch
        ("large", 512, 21, 600),      # e_raw ~ 6.6e8: correction branch
        ("saturated", 512, 24, 512),  # e_raw ~ 6.2e9 >= 2^32: clamp
    ]
    df = spark.createDataFrame(rows, "name string, nb int, K int, S long")
    got = {
        r["name"]: r["est"]
        for r in df.select("name", _hll_est_col().alias("est")).collect()
    }

    def e_raw(nb, K, S):
        V = 512 - nb
        return alpha * 512 * 512 * (2.0 ** K) / (V * 2.0 ** K + S)

    assert got["linear"] == 512.0 * math.log(512.0 / (512 - 40))
    assert got["midrange"] == e_raw(512, 10, 2048)
    raw_l = e_raw(512, 21, 600)
    assert 2**32 / 30 < raw_l < 2**32
    assert got["large"] == -(2.0**32) * math.log(1.0 - raw_l / 2.0**32)
    assert got["large"] > raw_l  # correction undoes the undercount
    raw_s = e_raw(512, 24, 512)
    assert raw_s >= 2**32
    assert got["saturated"] == raw_s  # clamped: no NULL, no ln(<=0)


def test_minhash_contamination_truncated_copy(spark):
    """An exact benchmark copy estimates Jaccard 1.0 (all 8 components
    agree); a 2/3-truncated copy still surfaces above the 0.5 flag; an
    unrelated document never pairs."""
    from rrdtool_1_x_spark.datapipe.decontam import minhash_contamination_pairs

    body = " ".join(f"w{i} common run of tokens" for i in range(12))
    other = " ".join(f"z{i} totally different words" for i in range(12))
    docs = spark.createDataFrame(
        [(1, body), (2, other)], "doc_id long, text string"
    )
    toks = body.split()
    bench = spark.createDataFrame(
        [(10, body), (11, " ".join(toks[: 2 * len(toks) // 3]))],
        "bench_id long, text string",
    )
    out = {
        (r["doc_id"], r["bench_id"]): r
        for r in minhash_contamination_pairs(docs, bench).collect()
    }
    assert out[(1, 10)]["matches"] == 8 and out[(1, 10)]["est_jaccard"] == 1.0
    assert (1, 11) in out and out[(1, 11)]["matches"] >= 4
    assert all(d != 2 for d, _ in out)


def test_minhash_contamination_bucket_cap(spark):
    """A band bucket over the cap is dropped whole — the boilerplate
    skew guard: identical docs flood one bucket and produce NO pairs
    under a cap smaller than the flood."""
    from rrdtool_1_x_spark.datapipe.decontam import minhash_contamination_pairs

    text = "same boilerplate body repeated verbatim across the fleet"
    docs = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(0, text)], "bench_id long, text string")
    flooded = minhash_contamination_pairs(docs, bench, max_bucket_size=5)
    assert flooded.count() == 0
    ok = minhash_contamination_pairs(docs, bench, max_bucket_size=512)
    assert ok.count() == 6


def test_kmv_exact_below_k(spark):
    """A group with fewer than k distinct values gets its EXACT count
    (the synopsis holds everything), duplicates notwithstanding."""
    from rrdtool_1_x_spark.datapipe.sketch import kmv_distinct

    rows = [("g", f"v{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = kmv_distinct(df, F.col("v"), ["g"], k=128).first()
    assert got["n_syn"] == 40 and got["kmv_est"] == 40


def test_kmv_estimate_accuracy(spark):
    """5000 distinct values, k=128: the (k-1)*2^60/h_k estimator lands
    within the ~2/sqrt(k) relative-error band."""
    from rrdtool_1_x_spark.datapipe.sketch import kmv_distinct

    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.concat(F.lit("item"), "id").alias("v")
    )
    got = kmv_distinct(df, F.col("v"), ["g"], k=128).first()
    assert got["n_syn"] == 128
    assert abs(got["kmv_est"] - 5000) / 5000 < 0.25


def test_kmv_synopsis_mergeable(spark):
    """synopsis(A UNION B) == k-smallest of synopsis(A) UNION synopsis(B)
    — the multiset-algebra property that justifies keeping KMV next to
    HLL."""
    from rrdtool_1_x_spark.datapipe.sketch import kmv_synopsis

    a = spark.range(1000).select(F.concat(F.lit("a"), "id").alias("v"))
    b = spark.range(1000).select(F.concat(F.lit("b"), "id").alias("v"))
    k = 64
    sab = sorted(
        r["h"] for r in kmv_synopsis(a.union(b), F.col("v"), k=k).collect()
    )
    sa = [r["h"] for r in kmv_synopsis(a, F.col("v"), k=k).collect()]
    sb = [r["h"] for r in kmv_synopsis(b, F.col("v"), k=k).collect()]
    merged = sorted(set(sa) | set(sb))[:k]
    assert sab == merged


def test_kmv_overlap_identical_and_disjoint(spark):
    """Identical groups estimate Jaccard 1.0 with inter == union;
    disjoint groups estimate (near-)zero intersection."""
    from rrdtool_1_x_spark.datapipe.sketch import kmv_source_overlap

    same = spark.range(500).selectExpr(
        "explode(array('x', 'y')) AS g", "concat('v', id) AS v"
    )
    got = kmv_source_overlap(same, F.col("v"), "g", k=64).first()
    assert got["jaccard_est"] == 1.0
    assert got["inter_est"] == got["union_est"]
    disj = spark.range(500).selectExpr(
        "if(id < 250, 'x', 'y') AS g", "concat('v', id) AS v"
    )
    got2 = kmv_source_overlap(disj, F.col("v"), "g", k=64).first()
    assert got2["jaccard_est"] < 0.1


def test_kmv_index_multi_append(spark, tmp_path):
    """Two successive appends to a stored synopsis reproduce the one-shot
    synopsis exactly (merge theorem, persisted form)."""
    from rrdtool_1_x_spark.datapipe.sketch import (
        append_kmv_synopsis,
        kmv_index_distinct,
        kmv_distinct,
        kmv_synopsis,
        write_kmv_synopsis,
    )

    full = spark.range(900).selectExpr(
        "concat('g', id % 2) AS g", "concat('v', id) AS v"
    )
    p = str(tmp_path / "kmv")
    write_kmv_synopsis(full.filter("id < 300"), p, F.col("v"), ["g"], k=64)
    append_kmv_synopsis(
        full.filter("id >= 300 AND id < 600"), p, F.col("v"), ["g"], k=64
    )
    append_kmv_synopsis(full.filter("id >= 600"), p, F.col("v"), ["g"], k=64)
    stored = sorted(
        (r["g"], r["h"])
        for r in spark.read.parquet(p).collect()
    )
    oneshot = sorted(
        (r["g"], r["h"]) for r in kmv_synopsis(full, F.col("v"), ["g"], k=64).collect()
    )
    assert stored == oneshot
    got = {
        r["g"]: r["kmv_est"]
        for r in kmv_index_distinct(spark, p, k=64).collect()
    }
    want = {
        r["g"]: r["kmv_est"]
        for r in kmv_distinct(full, F.col("v"), ["g"], k=64).collect()
    }
    assert got == want


def test_hll_register_multi_append(spark, tmp_path):
    """Register max-merge is idempotent + associative: two appends (one a
    REPLAY of already-indexed rows) reproduce the one-shot estimate
    exactly."""
    from rrdtool_1_x_spark.datapipe.sketch import (
        append_hll_registers,
        hll_distinct,
        hll_index_distinct,
        write_hll_registers,
    )

    full = spark.range(2000).selectExpr(
        "concat('g', id % 2) AS g", "concat('v', id) AS v"
    )
    p = str(tmp_path / "hll")
    write_hll_registers(full.filter("id < 800"), p, F.col("v"), ["g"])
    append_hll_registers(full.filter("id >= 800"), p, F.col("v"), ["g"])
    # replayed batch: max-merge must absorb it with no drift
    append_hll_registers(full.filter("id < 400"), p, F.col("v"), ["g"])
    got = {
        r["g"]: r["hll_est"] for r in hll_index_distinct(spark, p).collect()
    }
    want = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(full, F.col("v"), ["g"]).collect()
    }
    assert got == want


def test_cms_table_additive_append(spark, tmp_path):
    """Counter linearity: two appends reproduce the one-shot CM table
    cell-for-cell (and therefore every point estimate)."""
    from rrdtool_1_x_spark.datapipe.sketch import (
        append_cms_table,
        cms_table,
        write_cms_table,
    )

    full = spark.range(3000).selectExpr("concat('v', id % 200) AS v")
    p = str(tmp_path / "cms")
    write_cms_table(full.filter("id < 1000"), p, F.col("v"))
    append_cms_table(
        full.filter("id >= 1000 AND id < 2000"), p, F.col("v")
    )
    append_cms_table(full.filter("id >= 2000"), p, F.col("v"))
    stored = sorted(
        (r["d"], r["bucket"], r["cnt"])
        for r in spark.read.parquet(p).collect()
    )
    oneshot = sorted(
        (r["d"], r["bucket"], r["cnt"])
        for r in cms_table(full, F.col("v")).collect()
    )
    assert stored == oneshot


def test_remove_contaminated_spans_surgical(spark):
    """Only the benchmark-overlapping window is excised; the rest of the
    document survives; clean documents pass through untouched; token
    conservation holds (kept + removed == total)."""
    from rrdtool_1_x_spark.datapipe.decontam import remove_contaminated_spans

    quote = "what is the capital of freedonia answer rufus"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + quote + " trailing commentary after"),
            (2, "totally clean document with no benchmark overlap at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(10, quote)], "bench_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_contaminated_spans(docs, bench, n=8).collect()
    }
    assert out[1]["removed_tokens"] == 8
    assert "freedonia" not in out[1]["text"]
    assert out[1]["text"].startswith("intro words here")
    assert out[1]["text"].endswith("trailing commentary after")
    assert out[2]["removed_tokens"] == 0
    assert out[2]["text"] == docs.collect()[1]["text"]
    for r in out.values():
        kept = len(r["text"].split()) if r["text"] else 0
        assert kept + r["removed_tokens"] == r["n_tokens"]


def test_leakage_safe_split_groups_never_straddle(spark):
    from rrdtool_1_x_spark.datapipe.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # components {0,1,2} and {10,11}; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    assert len(out) == 40
    by_id = {r["doc_id"]: r for r in out}
    # whole component shares rep AND split
    assert {by_id[i]["rep"] for i in (0, 1, 2)} == {0}
    assert len({by_id[i]["split"] for i in (0, 1, 2)}) == 1
    assert {by_id[i]["rep"] for i in (10, 11)} == {10}
    assert by_id[10]["split"] == by_id[11]["split"]
    # singletons keep their own id as rep
    assert by_id[25]["rep"] == 25


def test_shard_epoch_partition_and_reseed(spark):
    from rrdtool_1_x_spark.datapipe.sampling import shard_epoch

    docs = spark.createDataFrame(
        [(i,) for i in range(100)], "doc_id long"
    )
    out = shard_epoch(docs, shard_size=16).collect()
    assert len(out) == 100
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    # 6 full shards of 16 + a final partial of 4, positions dense 0..n-1
    sizes = {s: len(v) for s, v in by_shard.items()}
    assert sorted(sizes.values()) == [4] + [16] * 6
    assert all(sorted(v) == list(range(len(v))) for v in by_shard.values())
    # deterministic under re-run; a different seed reshuffles
    again = shard_epoch(docs, shard_size=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = shard_epoch(docs, shard_size=16, seed="epoch1").collect()
    assert {(r["doc_id"], r["shard"]) for r in other} != {
        (r["doc_id"], r["shard"]) for r in out
    }


def test_dq_checks_detect_injected_defects(spark):
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.dq import (
        check_predicate,
        check_ref,
        check_unique,
        dq_report,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    rep = {
        r["check"]: r
        for r in dq_report(
            [
                check_ref("fk", child, "fk", parent, "pk"),
                check_unique("uniq", dup, ["k"]),
                check_predicate("pos", child, F.col("fk") <= 0),
            ]
        ).collect()
    }
    # orphans: fk=99 and the NULL fk (strict-FK convention)
    assert (rep["fk"]["n_checked"], rep["fk"]["n_violations"]) == (4, 2)
    assert rep["uniq"]["n_violations"] == 1 and rep["uniq"]["pass_flag"] == 0
    # NULL predicate evaluates as violation (conservative convention)
    assert rep["pos"]["n_violations"] == 1


def test_dq_check_unique_null_keys_are_injective(spark):
    """Composite keys with NULL components must not collide: ('x', NULL),
    (NULL, 'x') and ('x', '') are three distinct keys (zero violations),
    while duplicate all-NULL keys DO violate (GROUP BY NULL convention)."""
    from rrdtool_1_x_spark.datapipe.dq import check_unique, dq_report

    distinct_nulls = spark.createDataFrame(
        [("x", None), (None, "x"), ("x", "")], "a string, b string"
    )
    dup_nulls = spark.createDataFrame(
        [(None, None), (None, None), ("v", None), ("v", None), ("w", "y")],
        "a string, b string",
    )
    rep = {
        r["check"]: r
        for r in dq_report(
            [
                check_unique("inj", distinct_nulls, ["a", "b"]),
                check_unique("nulldup", dup_nulls, ["a", "b"]),
            ]
        ).collect()
    }
    assert (rep["inj"]["n_violations"], rep["inj"]["pass_flag"]) == (0, 1)
    # groups: (NULL,NULL)x2, ('v',NULL)x2, ('w','y') -> 5 rows, 3 groups
    assert (rep["nulldup"]["n_checked"], rep["nulldup"]["n_violations"]) == (
        5,
        2,
    )


def test_priority_sample_weight_biased_exact_and_guarded(spark):
    """Priority sampling reproduces the exact Python recurrence (60-bit
    md5 hash, floor-quantized inverse priority), is biased toward heavy
    rows (a 1000x-weight row wins top-1 in most seeds), and excludes
    non-positive weights."""
    import hashlib

    from rrdtool_1_x_spark.datapipe.sampling import priority_sample

    rows = [(i, 1) for i in range(50)] + [(99, 1000), (100, 0), (101, -5)]
    df = spark.createDataFrame(rows, "doc_id long, wt long")

    def ref_rank(seed):
        cand = []
        for did, w in rows:
            if w <= 0:
                continue
            h = int(
                hashlib.md5(f"{seed}:{did}".encode()).hexdigest()[:15], 16
            )
            cand.append(((h + 1) // w, -w, h, did))
        return [d for _, _, _, d in sorted(cand)]

    got = priority_sample(df, k=5, weight_col="wt", seed="prio").orderBy(
        "prio_rank"
    ).collect()
    assert [r["doc_id"] for r in got] == ref_rank("prio")[:5]
    assert all(r["doc_id"] not in (100, 101) for r in got)
    # bias: across 20 seeds, the heavy row takes rank 1 most of the time
    wins = sum(
        1
        for s in range(20)
        if priority_sample(df, k=1, weight_col="wt", seed=f"s{s}")
        .first()["doc_id"]
        == 99
    )
    assert wins >= 15, wins


def test_priority_sample_heavy_bucket_tiebreak(spark):
    """Rows whose weight exceeds h+1 all floor-quantize to inverse
    priority 0; within that bucket the tie-break is weight DESC (then
    hash, id), so the heaviest row ranks first — the Duffield-order
    lean, not a uniform hash draw."""
    from rrdtool_1_x_spark.datapipe.sampling import priority_sample

    big = 1 << 61  # >= any 60-bit hash + 1 -> inv_prio 0 for all
    rows = [(1, big), (2, big * 2), (3, big), (4, 7)]
    df = spark.createDataFrame(rows, "doc_id long, wt long")
    got = (
        priority_sample(df, k=4, weight_col="wt", seed="prio")
        .orderBy("prio_rank")
        .collect()
    )
    # rank 1 = the strictly heaviest zero-bucket row; the two equal-BIG
    # rows follow in (hash, id) order; the light row is last
    assert got[0]["doc_id"] == 2
    assert {got[1]["doc_id"], got[2]["doc_id"]} == {1, 3}
    assert got[3]["doc_id"] == 4


def test_logq_sketch_buckets_accuracy_and_merge_law(spark):
    """The binary-bucket quantile sketch: bucket/rep equal the Python
    recurrence on edge values (powers of two, boundaries, 0), every
    estimate is the bucket lower edge within 1/16 one-sided relative
    error of the exact quantile, and the merge law is exact — the
    topped-up persisted sketch answers identically to the one-shot."""
    import math
    import random
    import tempfile

    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import (
        append_logq_sketch,
        logq_bucket,
        logq_index_quantiles,
        logq_quantiles,
        logq_rep,
        logq_sketch,
        write_logq_sketch,
    )

    def ref_bucket(v):
        if v <= 0:
            return 0
        if v < 32:
            return v
        s = v.bit_length() - 5
        return 16 * s + (v >> s)

    def ref_rep(b):
        if b < 32:
            return b
        s = b // 16 - 1
        return (b - 16 * s) << s

    edges = (
        list(range(0, 70))
        + [2**k for k in range(5, 40)]
        + [2**k - 1 for k in range(5, 40)]
    )
    df = spark.createDataFrame([(v,) for v in edges], "v long")
    got = df.select(
        "v",
        logq_bucket(F.col("v")).alias("b"),
        logq_rep(logq_bucket(F.col("v"))).alias("r"),
    ).collect()
    for r in got:
        assert r["b"] == ref_bucket(r["v"]), r
        assert r["r"] == ref_rep(r["b"]), r
        if r["v"] >= 1:
            assert r["r"] <= r["v"] <= r["r"] + max(r["r"] // 16, 1)

    rnd = random.Random(7)
    data = [int(rnd.lognormvariate(5, 2)) + 1 for _ in range(4000)]
    d2 = spark.createDataFrame([(v,) for v in data], "v long")
    q = logq_quantiles(logq_sketch(d2, F.col("v"))).first()
    data.sort()
    for num in (50, 90, 99):
        exact = data[math.ceil(num / 100 * len(data)) - 1]
        est = q[f"p{num}"]
        assert est <= exact and (exact - est) / exact <= 1 / 16 + 1e-12

    # merge law: write half, append half -> identical to one-shot
    path = tempfile.mkdtemp(prefix="logqtest_")
    ids = d2.withColumn("i", F.monotonically_increasing_id())
    write_logq_sketch(ids.filter(F.col("i") % 2 == 0), path, F.col("v"))
    append_logq_sketch(ids.filter(F.col("i") % 2 == 1), path, F.col("v"))
    one = {
        (r["bucket"], r["cnt"])
        for r in logq_sketch(d2, F.col("v")).collect()
    }
    stored = {
        (r["bucket"], r["cnt"])
        for r in spark.read.parquet(path).collect()
    }
    assert one == stored
    assert logq_index_quantiles(spark, path).first()["p90"] == q["p90"]


def test_balanced_shards_snake_and_balance(spark):
    """Snake dealing: hand-case assignment matches LPT order; on a
    heavy-tailed corpus the max/min shard-token ratio stays tight; the
    output is a total partition of the input."""
    import random

    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sampling import balanced_shards

    # hand case: weights 10..1 into 3 shards; rank = weight order
    hand = spark.createDataFrame(
        [(i, 10 - i) for i in range(10)], "doc_id long, wt long"
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(hand, 3, "wt").collect()
    }
    # ranks 0..9 -> snake shards 0,1,2, 2,1,0, 0,1,2, 2
    assert [got[i] for i in range(10)] == [0, 1, 2, 2, 1, 0, 0, 1, 2, 2]

    rnd = random.Random(5)
    rows = [(i, int(rnd.lognormvariate(5, 1.5)) + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, wt long")
    out = balanced_shards(df, 16, "wt")
    assert out.count() == 2000
    tot = {
        r["shard"]: r["t"]
        for r in out.groupBy("shard").agg(F.sum("weight").alias("t")).collect()
    }
    assert set(tot) == set(range(16))
    # the snake theorem: absolute imbalance bounded by ONE document
    wts = [w for _, w in rows]
    assert max(tot.values()) - min(tot.values()) <= max(wts) - min(wts)
    # moderate-tail regime: near-perfect balance
    rows2 = [(i, 50 + rnd.randrange(100)) for i in range(2000)]
    df2 = spark.createDataFrame(rows2, "doc_id long, wt long")
    tot2 = {
        r["shard"]: r["t"]
        for r in balanced_shards(df2, 16, "wt")
        .groupBy("shard")
        .agg(F.sum("weight").alias("t"))
        .collect()
    }
    assert max(tot2.values()) / min(tot2.values()) < 1.02


def test_span_corrupt_reference_and_invariants(spark):
    """span_corrupt equals a direct Python transcription of the hash
    draw / running-max island merge on hand docs, sentinels number in
    order, reconstruction works (corrupted+target hold every token),
    and the empty doc vanishes."""
    import hashlib

    from rrdtool_1_x_spark.datapipe.sampling import span_corrupt

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(doc_id, text, start_pct=30):
        toks = [t for t in text.lower().strip().split() if t]
        cum = None
        k = -1
        corrupted, target, n_masked, n_spans = [], [], 0, 0
        for p, w in enumerate(toks):
            h = h60(f"corrupt:{doc_id}:{p}")
            prev_cum = cum
            if h % 100 < start_pct:
                e = p + (2 + (h // 100) % 3) - 1
                cum = e if cum is None else max(cum, e)
            m = cum is not None and cum >= p
            if m:
                n_masked += 1
                if prev_cum is None or prev_cum < p:
                    k += 1
                    n_spans += 1
                    corrupted.append(f"<extra_id_{k}>")
                    target.append(f"<extra_id_{k}> {w}")
                else:
                    target.append(w)
            else:
                corrupted.append(w)
        return (
            len(toks), n_spans, n_masked,
            " ".join(corrupted), " ".join(target),
        )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "   "),  # whitespace-only -> zero tokens -> no output row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_spans"], r["n_masked"],
            r["corrupted"], r["target"],
        )
        for r in span_corrupt(df, start_pct=30).collect()
    }
    assert 3 not in got
    for did, text in rows[:2]:
        assert got[did] == ref(did, text), did
    # reconstruction: token multiset of corrupted+target minus sentinels
    # equals the original tokens
    for did, text in rows[:2]:
        toks = sorted(text.lower().split())
        pieces = (got[did][3] + " " + got[did][4]).split()
        rebuilt = sorted(t for t in pieces if not t.startswith("<extra_id_"))
        assert rebuilt == toks
