"""Streaming face of operators/incremental: each micro-batch of newly
ingested docs is verdicted against the PERSISTED snapshot indexes — the
continuous-ingest shape of "is this already in the lake".

foreachBatch, not a stream-static join chain: the probe pipeline needs a
best-match window (row_number) and multi-branch unions that Structured
Streaming forbids on a stream. Per-doc verdicts are independent given a
fixed snapshot, so batch-replay equivalence is EXACT (pinned in
tests/test_incremental.py): N micro-batches probed against snapshot S
produce the same verdict rows as one batch run of their union against S.

Index refresh cadence is the caller's decision — rebuild corpus_index
when a snapshot publishes; within a stream run the indexes are immutable
artifacts, exactly how a lakehouse dedup service treats them. At
production scale the sink is the lake table the NEXT snapshot's index is
built from; tests use a parquet sink with Trigger.AvailableNow, which
exercises the identical micro-batch machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from json_schema_py_spark.operators.incremental import incremental_dedup


def incremental_dedup_stream(
    batch_stream: DataFrame,
    corpus: DataFrame,
    exact_index: DataFrame,
    band_index: DataFrame,
    out_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
    **dedup_kwargs,
):
    """Start the probe stream: every micro-batch runs the full batch
    operator against the static snapshot frames and appends
    (doc_id, verdict, matched_id, jaccard) to ``out_path``. Returns the
    StreamingQuery. ``dedup_kwargs`` forward to incremental_dedup and
    must match the corpus_index build (num_hashes/bands/shingle_k)."""

    def _probe(bdf: DataFrame, _epoch_id: int) -> None:
        incremental_dedup(
            bdf, corpus, exact_index, band_index, **dedup_kwargs
        ).write.mode("append").parquet(out_path)

    writer = batch_stream.writeStream.foreachBatch(_probe).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
