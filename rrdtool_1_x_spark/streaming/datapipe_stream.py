"""Structured Streaming drive for the incremental dedup indexes.

A document stream (any readStream source with (doc_id, text) columns) is
sunk through ``foreachBatch`` into the append-only LSH state that
``write_band_index`` / ``write_simhash_index`` persist: each micro-batch
shingles/fingerprints ONLY its own rows, joins them against the persisted
band/block tables, appends the newly discovered near-dup pairs to
``{index_path}/pairs``, and extends the index — the streaming form of the
exactly-composing append contract (full-corpus pairs == initial ∪ appends,
tested batch-side in tests/test_datapipe.py and stream-side in
tests/test_streaming.py).

This is the standard continuous-ingest dedup topology for a training-data
pipeline: the index is the only state, it lives in storage (not executor
memory), and a replayed micro-batch re-derives the same pairs (the pair
append is idempotent under DISTINCT consumption — consumers read pairs
with dropDuplicates(id_a, id_b), documented below) — so failure recovery
is checkpoint-based replay, no custom state store needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from rrdtool_1_x_spark.datapipe.dedup import (
    append_band_index,
    append_simhash_index,
)


def start_minhash_stream(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
    **append_kwargs,
) -> StreamingQuery:
    """Sink a streaming document frame into a ``write_band_index`` index.

    Per micro-batch: ``append_band_index`` (batch-only shingling + bucket
    join against the persisted bands) and an append of the new verified
    pairs to ``{index_path}/pairs``. Exactly-once caveat: a micro-batch
    replay after a crash between the pair append and the checkpoint commit
    re-appends the same pairs — consumers must read pairs with
    ``dropDuplicates(["id_a", "id_b"])`` (idempotent under replay; the
    index appends themselves are anti-joined against the registry, so the
    index never double-counts)."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        pairs = append_band_index(batch, index_path, **append_kwargs)
        pairs.write.mode("append").parquet(f"{index_path}/pairs")

    writer = doc_stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_simhash_stream(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
    **append_kwargs,
) -> StreamingQuery:
    """Sink a streaming document frame into a ``write_simhash_index``
    index; same topology and replay semantics as start_minhash_stream."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        pairs = append_simhash_index(batch, index_path, **append_kwargs)
        pairs.write.mode("append").parquet(f"{index_path}/pairs")

    writer = doc_stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
