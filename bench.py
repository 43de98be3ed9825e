"""Benchmark the engine's headline queries.

Runs on local[$SPARK_GRAFT_CPUS] over $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (no collect overhead, no
column pruning shortcuts).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


NAMES = [
    "pdp_gauge",
    "counter_rate",
    "cdp_avg",
    "cdp_max",
    "reduce_avg",
    "rpn_chain",
    "trend",
    "vdef_stats",
    "vdef_percentile",
    "shift_week",
    "xport_pivot",
    "graph_stack",
    "sql_derive",
    "dedup_exact",
    "text_stats",
    "script_mix",
    "minhash_sig",
    "ann_cosine_top10",
    "near_dup_pairs",
    "lsh_pr",
    "dup_groups",
    "embed_near_dup",
    "lsh_topk",
    "ivf_topk",
    "fingerprint",
    "weighted_jaccard",
    "simhash_near_dup",
    "decontam_overlap",
    "hash_split",
    "stratified_sample",
    "token_budget",
    "vocab_top",
    "vocab_coverage",
    "pii_scrub",
    "unigram_logprob",
    "curate",
    "semantic_dedup",
    "bpe_tokens",
    "dup_spans",
    "span_dedup",
    "hash_embed",
    "bpe_train",
    "unigram_vocab",
    "unigram_segment",
    "unigram_nbest",
    "bpe_encode",
    "text_semantic_dedup",
    "cluster_keywords",
    "bigram_logprob",
    "dedup_best",
    "gopher_rep",
    "domain_stats",
    "c4_clean",
    "line_dedup",
    "dsir_weight",
    "ppl_bucket",
    "tfidf_topk",
    "html_extract",
    "ann_int8_topk",
    "ann_int4_topk",
    "int4_recall",
    "trunc_rerank",
    "label_prop",
    "temperature_mix",
    "mix_sample",
    "pq_topk",
    "pq_recall",
    "ivfpq_topk",
    "datacard",
    "corpus_diff",
    "split_leak",
    "hll_distinct",
    "cms_topk",
    "bloom_decontam",
    "tok_quantiles",
    "centroid_classify",
    "kmeans_iter",
    "kmeans_topup",
    "pagerank",
    "pagerank_topup",
    "hits",
    "harmonic",
    "triangles",
    "group_split",
    "ngram_diversity",
    "fertility",
    "asof_join",
    "range_join",
    "sessionize",
    "event_paths",
    "event_transitions",
    "funnel",
    "retention",
    "event_rollup",
    "dq_checks",
    "scd2",
    "mad_outlier",
    "json_props",
    "shard_epoch",
    "cdc_dedup",
    "pq_index_topup",
    "ivfpq_residual_topk",
    "residual_recall",
    "nb_classify",
    "resid_index_topup",
    "hard_negatives",
    "source_overlap",
    "diverse_sample",
    "bm25_topk",
    "phrase_search",
    "rrf_fuse",
    "pmi_topk",
    "chunk_docs",
    "span_corrupt",
    "text_norm",
    "url_dedup",
    "bm25_index_topup",
    "oov_rate",
    "kn_bigram",
    "kn_heldout",
    "edit_near_dup",
    "minhash_decontam",
    "decontam_spans",
    "zorder_events",
    "hilbert_events",
    "winnow_fp",
    "winnow_overlap",
    "priority_sample",
    "rouge_pairs",
    "logq_quantiles",
    "logq_index_topup",
    "winnow_index_topup",
    "shard_balance",
    "source_kl",
    "kmv_distinct",
    "kmv_overlap",
    "rot_pq_topk",
    "rot_pq_recall",
    "opq_topk",
    "opq_recall",
    "opq_index_topup",
    "opq_ivfpq_topk",
    "rank_metrics",
    "kmv_index_topup",
    "hll_index_topup",
    "cms_index_topup",
    "langid",
    "suffix_dedup",
    "suffix_index_topup",
    "suffix_excise",
    "canary_scan",
    "softdedup_weights",
    # suffix_stream is a one-shot drain (memoized construction) — its
    # throughput story lives with the dedicated stream rows
    # dedup_stream / stream_join / sketch_stream / logq_stream are one-shot drains (memoized
    # construction) — their throughput story lives with the dedicated
    # stream rows (curation_stream, windows_stream), not the timing loop
]


def write_plans(sf_dir: str) -> None:
    """--plans: capture each headline query's formatted physical plan plus
    the scale-relevant counters (exchanges, codegen spans, pushed filters)
    into PLANS.md — the reviewable record that filters/pruning reach the
    scans and the hot path stays in whole-stage codegen."""
    import contextlib
    import io

    from rrdtool_1_x_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    # static plans: AQE finalizes codegen/coalescing at runtime and hides
    # the codegen spans from a pre-execution explain; the static plan is
    # what every executor starts from and shows the full codegen layout
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    queries = entry_mod.queries()
    # full registry, timed headliners first: every driver-gated query
    # gets a recorded plan. For one-shot drains (streams, daemon/xport
    # sinks) the construction side effect runs once here and the
    # recorded plan is the post-drain sink read — the batch plan that
    # actually serves the result (the drain itself is a streaming
    # query; its per-batch dataflow is pinned by the stream pytests).
    all_names = list(NAMES) + [k for k in queries if k not in set(NAMES)]
    lines = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `python bench.py --plans` over `{sf_dir}` with AQE",
        "disabled (production sessions enable it; it only re-plans at",
        "runtime). Per query: exchange (shuffle) count, WholeStageCodegen",
        "span count, parquet PushedFilters, then the formatted plan.",
        "Covers the FULL driver registry (timed headliners first); for",
        "one-shot drain gates the plan shown is the post-drain sink read.",
        "",
    ]
    for name in all_names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_wsc = len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"codegen id : (\d+)", plan))
        )
        pushed = sorted(
            set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)) - {""}
        )
        lines += [
            f"## {name}",
            "",
            f"- exchanges: {n_ex}  · codegen spans: {n_wsc}"
            + (f"  · pushed filters: {'; '.join(pushed)}" if pushed else ""),
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]
    with open(os.path.join(os.path.dirname(__file__) or ".", "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"PLANS.md written ({len(all_names)} queries)")
    spark.stop()


def ensure_scaled(src_dir: str, factor: int) -> str:
    """Materialize a factor-x copy of the benchmark tables under /tmp (once)
    by replicating rows with shifted keys/timestamps — the scale-up sweep
    input (testdata caps at sf0.1). Time-series events get distinct series
    ids per replica (the scale axis a collector fleet actually grows);
    documents/embeddings get distinct doc/vec ids."""
    out = f"/tmp/sparkgraft_scaled_{factor}x"
    marker = f"{out}/_READY"
    if os.path.exists(marker):
        return out
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.session import get_spark

    spark = get_spark("scaleup", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # the driver's events.parquet carries TIMESTAMP(NANOS) — readable only
    # as long; the scaled copy stores the same long values
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(out, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").alias("_rep"))
    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    (
        ev.crossJoin(reps)
        .withColumn("event_type", F.concat_ws("_", "event_type", F.col("_rep")))
        .drop("_rep")
        .write.mode("overwrite").parquet(f"{out}/events.parquet")
    )
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * 1_000_000)
        .drop("_rep")
        .write.mode("overwrite").parquet(f"{out}/documents.parquet")
    )
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * 1_000_000)
        .drop("_rep")
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        spark.read.parquet(f"{src_dir}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    with open(marker, "w") as f:
        f.write("ok")
    spark.stop()
    return out


def bench_curation_stream(spark, sf_dir: str) -> tuple[float, int]:
    """Drain the streaming curation pipeline over the documents table in
    3 micro-batches (cold state: empty band index) and return (wall
    seconds, docs). Each call builds a fresh tempdir state + checkpoint,
    so repeat drains are independent cold runs — main() times best-of-2
    with a recorded worst/best band; the batch `curate` row does the
    same verdict work in one job for comparison."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.dedup import write_band_index
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_curation_stream,
    )

    work = tempfile.mkdtemp(prefix="curstream_")
    schema = "doc_id bigint, text string"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    n_batches = 3
    src = f"{work}/in"
    for i in range(n_batches):
        docs.filter(F.col("doc_id") % n_batches == i).coalesce(4).write.mode(
            "append"
        ).parquet(src)
    state = f"{work}/state"
    write_band_index(spark.createDataFrame([], schema), f"{state}/lsh")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    t0 = time.perf_counter()
    q = start_curation_stream(stream, state, f"{work}/ck")
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("curation_stream drain exceeded 600s")
    elapsed = time.perf_counter() - t0
    verdicts = (
        spark.read.parquet(f"{state}/verdicts")
        .dropDuplicates(["doc_id"])
        .count()
    )
    shutil.rmtree(work, ignore_errors=True)
    if verdicts != n:
        raise AssertionError(f"curation_stream: {verdicts}/{n} verdicts")
    return round(elapsed, 3), n


def _bench_extras():
    """Bench-only query variants — deployment configurations that cannot
    carry a DuckDB oracle (xxhash64 is JVM-native) and so must not enter
    the driver's correctness registry. Timed identically to registry
    queries when named in SPARK_GRAFT_ONLY; results equal the md5-default
    gates' semantics (same span logic, narrower shuffle keys)."""

    def dup_spans_xx(spark, sf_dir):
        from rrdtool_1_x_spark.datapipe.dedup import duplicated_ngram_spans

        import __spark_entry__ as entry_mod

        return duplicated_ngram_spans(
            entry_mod._docs(spark, sf_dir), n=8, hash_fn="xxhash64"
        )

    def span_dedup_xx(spark, sf_dir):
        from rrdtool_1_x_spark.datapipe.dedup import remove_duplicate_spans

        import __spark_entry__ as entry_mod

        return remove_duplicate_spans(
            entry_mod._docs(spark, sf_dir), n=8, hash_fn="xxhash64"
        )

    return {"dup_spans_xx": dup_spans_xx, "span_dedup_xx": span_dedup_xx}


def bench_windows_stream(spark, sf_dir: str) -> tuple[float, int]:
    """Drain the watermarked event-time window pair (fixed windows +
    session windows, streaming/windows.py) over the events table in 3
    micro-batches and return (wall seconds, events processed — each event
    passes through both aggregations). Fresh tempdir checkpoint per call
    (independent cold drains; main() runs best-of-2 with a recorded
    band, same as curation_stream). The row pins the per-micro-batch
    fixed cost of the two stateful aggregation shapes next to their batch
    twins (event_rollup, sessionize)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.streaming.windows import (
        start_session_stream,
        start_windowed_counts,
    )

    work = tempfile.mkdtemp(prefix="winstream_")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = events.count()
    src = f"{work}/in"
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(4).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    t0 = time.perf_counter()
    q1 = start_windowed_counts(stream, f"{work}/win", f"{work}/ck1")
    q2 = start_session_stream(stream, f"{work}/sess", f"{work}/ck2")
    for q in (q1, q2):
        if not q.awaitTermination(600):
            q1.stop()
            q2.stop()
            raise TimeoutError("windows_stream drain exceeded 600s")
    elapsed = time.perf_counter() - t0
    win_rows = spark.read.parquet(f"{work}/win").count()
    sess_rows = spark.read.parquet(f"{work}/sess").count()
    shutil.rmtree(work, ignore_errors=True)
    if win_rows == 0 or sess_rows == 0:
        raise AssertionError(
            f"windows_stream: empty output (win={win_rows}, sess={sess_rows})"
        )
    return round(elapsed, 3), 2 * n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--plans" in sys.argv:
        write_plans(os.environ.get("SPARK_GRAFT_PLANS_SF_DIR", sf_dir))
        return
    if "--scale" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--scale") + 1])
        sf_dir = ensure_scaled(sf_dir, factor)
        # scale-up shuffle sizing: start wide, let AQE coalesce by bytes
        os.environ.setdefault(
            "SPARK_GRAFT_INITIAL_PARTITIONS",
            str(int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 8),
        )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from rrdtool_1_x_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cpus=cpus)
    queries = dict(entry_mod.queries())
    extras = _bench_extras()
    names = NAMES
    only_env = os.environ.get("SPARK_GRAFT_ONLY", "")
    for xname, xfn in extras.items():
        queries[xname] = xfn
        if xname in only_env.split(","):
            names = names + [xname]
    # SPARK_GRAFT_ONLY=q1,q2 — targeted subset for scale probes of new
    # queries without re-running the whole headline set at 10x/100x
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = [n for n in names if n in set(only.split(","))]
    # warm-run protocol (BASELINE.md): first execution pays JVM JIT +
    # whole-stage-codegen compilation, which dominates at small SF and
    # amortizes to zero at scale; measure the warmed run. Best-of-3 on the
    # warmed runs: single-shot sub-second timings on this host swing 2x+
    # (GC/IO interference), the minimum is the stable estimator of the
    # query's actual cost, and the recorded spread separates real
    # round-over-round regressions from host noise.
    # SPARK_GRAFT_RUNS bumps the warmed best-of-N (default 3) — the
    # isolated re-pin knob for queries whose shared-session timing
    # drifted beyond their noise band with an unchanged plan
    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs), 3)
        # worst-vs-best ratio of the warmed runs — the per-query noise band
        spread[name] = round(max(runs) / min(runs), 2)

    # streaming drains: each run builds its OWN fresh tempdir state, so
    # repeat drains are independent (cold state every time) — run
    # best-of-2 and record the worst/best band like the timed queries.
    # One-shot numbers swung 17->24 s round-over-round (r7 watch item);
    # the band makes stream deltas attributable to code vs host noise.
    def _best_of_2(fn):
        t1, n1 = fn(spark, sf_dir)
        t2, n2 = fn(spark, sf_dir)
        assert n1 == n2, f"stream drain row count moved: {n1} != {n2}"
        return round(min(t1, t2), 3), n1, round(max(t1, t2) / min(t1, t2), 2)

    # streaming drains live in their OWN artifact sub-object ("streams"):
    # curation_stream is ~15% wall-clock of trigger/checkpoint overhead,
    # not query dataflow — keeping it out of the headline total makes the
    # total track query regressions only (drains keep their own bands)
    streams: dict[str, dict] = {}
    if not (only and "curation_stream" not in only):
        sec, n_stream, band = _best_of_2(bench_curation_stream)
        streams["curation_stream"] = {
            "sec": sec,
            "band_worst_over_best": band,
            "batches": 3,
            "docs_per_sec": round(n_stream / sec, 1) if sec else 0.0,
        }
    if not (only and "windows_stream" not in only):
        sec, n_winev, band = _best_of_2(bench_windows_stream)
        streams["windows_stream"] = {
            "sec": sec,
            "band_worst_over_best": band,
            "batches": 3,
            "events_per_sec": round(n_winev / sec, 1) if sec else 0.0,
        }

    total = round(sum(times.values()), 3)
    # committed per-query ISOLATED best-of-5 bands (tools/isolated_bands.py):
    # micro-queries whose shared-session timing drifts with an unchanged
    # plan get their isolated envelope embedded in the artifact, so
    # tools/bench_diff.py consults it before flagging a regression
    iso_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ISOLATED_BANDS.json")
    isolated = {}
    if os.path.exists(iso_path):
        with open(iso_path) as f:
            isolated = json.load(f).get("queries", {})
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": times,
            "noise_worst_over_best": spread,
            "isolated_bands": isolated,
            "streams": streams,
            "stream_docs_per_sec": streams.get(
                "curation_stream", {}
            ).get("docs_per_sec", 0.0),
            "windows_stream_events_per_sec": streams.get(
                "windows_stream", {}
            ).get("events_per_sec", 0.0),
            "sf": sf,
        }
    )
    print(line)
    # also write the artifact to a file directly: round 9's one-line JSON
    # outgrew the driver's 2000-char stdout tail capture and the round
    # lost its comparability baseline. SPARK_GRAFT_BENCH_OUT overrides
    # the destination; only full (non-subset, non-scaled) runs are
    # written by default so probe runs never clobber the round artifact.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path is None and not only and "--scale" not in sys.argv:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_local_last.json",
        )
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
