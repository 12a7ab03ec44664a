"""Streaming incremental near-dup filter with stateful corpus growth.

The production ingestion shape for web-crawl training data: each
micro-batch of documents is (1) self-deduplicated within the batch,
(2) near-dup-checked against the kept corpus via its checkpointed
MinHash signature stage — O(batch), the kept corpus text is never
re-scanned (operators/dedup.py signature-stage design, VERDICT r03 #1)
— and (3) the surviving novel docs are appended to BOTH the kept-docs
stage and the signature stage, so the next batch dedups against them
too.  No reference counterpart (the reference is pure batch,
SURVEY §2.8); this composes the engine's own streaming sink, catalog
append, and incremental dedup primitives.

Replay safety (foreachBatch is at-least-once): both appends are TAGGED
with the batch id (Catalog.append(tag=...) — deterministic file names /
Iceberg overwrite-by-filter), so a replayed batch REPLACES its own
previous attempt instead of duplicating it; and the batch's own ids are
anti-joined out of the reference signatures before novelty scoring, so
a replay whose earlier attempt already absorbed the batch still scores
novelty against the same reference set as the first attempt
(self-matches would otherwise mark everything non-novel and the tagged
overwrite would erase the batch).  Document ids must be globally unique
across batches — standard for url-keyed crawls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_dedup_sink(
    catalog,
    id_col: str,
    text_col: str,
    sigs_stage: str = "corpus_sigs",
    kept_stage: str = "kept_docs",
    threshold: float = 0.7,
    **sig_kwargs,
):
    """foreachBatch function: self-dedup the micro-batch, drop docs that
    near-dup the kept corpus, append the novel survivors (docs + their
    signatures) to the catalog stages.  ``sig_kwargs`` (shingle_k /
    num_hashes / seed) must stay constant for the lifetime of the
    stages."""
    from entity_linking_spark.operators._cache import cache_scope
    from entity_linking_spark.operators.dedup import (
        dedup_assignment,
        incremental_dedup,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"b{batch_id}"
        entry = catalog.manifest_entry(sigs_stage)
        if tag in (entry.get("appends") or {}):
            return  # fully-committed batch replay: nothing to redo
        batch_df.persist()
        try:
            with cache_scope():
                # (1) within-batch self-dedup → min-id representatives
                pairs = minhash_lsh_pairs(
                    batch_df, id_col, text_col, threshold=threshold, **sig_kwargs
                )
                assign = dedup_assignment(batch_df, id_col, pairs)
                reps = batch_df.join(
                    assign.where(F.col("id") == F.col("keep_id"))
                    .select(F.col("id").alias(id_col)),
                    id_col,
                    "left_semi",
                )
                # (2) novelty vs the kept corpus (skip if bootstrapping);
                # the batch's own ids are excluded from the reference so a
                # partially-committed replay scores against the same set
                if catalog.is_complete(sigs_stage):
                    ref_sigs = catalog.read(sigs_stage).join(
                        F.broadcast(batch_df.select(F.col(id_col).alias("id"))),
                        "id",
                        "left_anti",
                    )
                    asg = incremental_dedup(
                        reps, None, id_col, text_col,
                        ref_sigs=ref_sigs, threshold=threshold, **sig_kwargs,
                    )
                    novel = reps.join(
                        asg.where(F.col("is_novel"))
                        .select(F.col("id").alias(id_col)),
                        id_col,
                        "left_semi",
                    )
                else:
                    novel = reps
                novel = novel.persist()
                try:
                    # (3) grow the corpus: docs first, signatures last —
                    # the sigs-stage manifest entry doubles as the
                    # batch-complete marker checked at entry
                    catalog.append(kept_stage, novel, tag=tag)
                    catalog.append(
                        sigs_stage,
                        minhash_signatures(novel, id_col, text_col, **sig_kwargs),
                        tag=tag,
                    )
                finally:
                    novel.unpersist()
        finally:
            batch_df.unpersist()

    return sink


def run_dedup_ingest(
    stream_df: DataFrame,
    catalog,
    checkpoint_dir: str,
    id_col: str = "id",
    text_col: str = "text",
    **kwargs,
):
    """Drain a document stream through the incremental-dedup sink with
    the availableNow trigger; returns the finished query.  Resumable:
    the stream checkpoint replays undelivered batches and the tagged
    appends make redelivery converge."""
    sink = incremental_dedup_sink(catalog, id_col, text_col, **kwargs)
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
