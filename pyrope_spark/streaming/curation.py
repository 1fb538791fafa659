"""Streaming curation stages: continuous dedup at ingest time.

The batch dedup family (`operators/dedup.py`, `curation.dedup_against_index`)
assumes the corpus is at rest; a live training-data pipeline also needs the
*ingest-time* variant — new documents arriving as a stream, deduplicated both
against each other (in-flight) and against everything already accepted into
the corpus. Structured Streaming expresses this as:

- in-flight dedup: ``withWatermark(ts) + dropDuplicates([fingerprint])`` —
  state is one fingerprint per in-window doc, expired by the watermark, so
  state size is bounded by arrival rate x watermark, not corpus size;
- corpus dedup: a per-micro-batch anti-join against the accepted-corpus
  fingerprint index (stream-static join, re-read per batch so each batch
  sees every earlier batch's accepted docs);
- acceptance: survivors append to the corpus parquet inside the same
  ``foreachBatch`` transaction scope.

At 100 TB the corpus side is a parquet/Delta table partitioned by
fingerprint prefix; the anti-join broadcasts the (tiny) batch against it,
i.e. the scan prunes to matching prefixes — no full-corpus shuffle per
micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrope_spark.operators.curation import text_fingerprint


def streaming_dedup_to_corpus(
    stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
):
    """Continuously accept only first-seen documents into a corpus directory.

    Returns the started StreamingQuery. Accepted rows are written to
    ``corpus_dir`` as parquet with an ``fp`` fingerprint column; duplicates
    (same normalized-text fingerprint) are dropped whether they arrive in
    the same micro-batch, across batches within the watermark (streaming
    state), or were accepted in any earlier batch (anti-join vs the corpus).
    """
    spark = stream.sparkSession
    pre = (
        stream.withColumn("fp", text_fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["fp"])
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        batch = batch_df.dropDuplicates(["fp"])
        try:
            seen = spark.read.parquet(corpus_dir).select("fp").distinct()
            batch = batch.join(seen, "fp", "left_anti")
        except AnalysisException:
            pass  # first batch: corpus path does not exist yet
        batch.write.mode("append").parquet(corpus_dir)

    return (
        pre.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
