"""Plan-shape regressions for the round-8 operators: map-only ops must
show ZERO Exchange, keyed ops must never degrade to a SinglePartition
exchange over the corpus (the global-window anti-pattern). Checked on
the physical plan string — the same evidence PLANS.md records."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _explain(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="extended")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _n_exchanges(df) -> int:
    return _explain(df).count("Exchange ")


def test_map_only_ops_have_zero_exchanges(spark, docs, emb):
    from rrdtool_1_x_spark.datapipe.layout import hilbert_expr
    from rrdtool_1_x_spark.datapipe.similarity import opq_permute
    from rrdtool_1_x_spark.datapipe.textstats import (
        script_mix,
        winnow_fingerprints,
    )

    hil = spark.range(100).select(
        hilbert_expr("(id & 255)", "((id * 7) & 255)", bits=8).alias("h")
    )
    assert _n_exchanges(hil) == 0

    perm = list(range(64))
    assert _n_exchanges(opq_permute(emb, perm)) == 0
    assert _n_exchanges(winnow_fingerprints(docs)) == 0
    assert _n_exchanges(script_mix(docs)) == 0


def test_keyed_ops_never_single_partition(spark, docs):
    from rrdtool_1_x_spark.datapipe.sampling import (
        balanced_shards,
        priority_sample,
        span_corrupt,
    )

    wd = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim("text")), r"\s+"))
        .cast("long")
        .alias("w"),
    )
    # stratified priority sample: keyed window only
    assert "SinglePartition" not in _explain(
        priority_sample(wd, 5, "w", ["source"])
    )
    # span corruption: doc-keyed windows only
    assert "SinglePartition" not in _explain(span_corrupt(docs))
    # balanced shards: range partition + broadcast prefix, and the
    # GLOBAL priority sample path goes through TakeOrdered, never a
    # corpus-wide rank window
    glob = priority_sample(wd, 5, "w")
    assert "TakeOrdered" in _explain(glob)


def test_logq_sketch_single_combinable_aggregate(spark, docs):
    from rrdtool_1_x_spark.datapipe.sketch import logq_sketch

    wd = docs.select(
        "source",
        F.size(F.split(F.lower(F.trim("text")), r"\s+"))
        .cast("long")
        .alias("v"),
    )
    sk = logq_sketch(wd, F.col("v"), ["source"])
    ex = _explain(sk)
    # exactly one shuffle (the (group, bucket) aggregate); partial_count
    # before it proves the map-side combine
    assert ex.count("Exchange ") == 1
    assert "partial_count" in ex
