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


def streaming_neardup_to_corpus(
    stream: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    num_hashes: int = 16,
    bands: int = 8,
    ngram_n: int = 1,
    verify_threshold: float = 0.7,
):
    """Ingest-time NEAR-duplicate suppression: the streaming twin of
    ``dedup.minhash_lsh_pairs`` + ``dedup_against_index``. Each micro-batch:

    1. one Arrow pass attaches minhash signatures AND shingle fingerprints
       (the verify input) to the batch;
    2. banded LSH keys join the batch against the ACCEPTED index's bucket
       table (band_no, band_key, doc_id) — candidates only, never
       all-pairs — and exact Jaccard over stored fingerprints confirms;
    3. in-flight: the same banding among batch docs, greedy
       smaller-id-wins (a doc duping an earlier batch doc drops even if
       that doc itself dropped — transitively it dupes the corpus);
    4. survivors append to ``corpus_dir``; their band rows and
       fingerprints append to the index under ``index_dir``.

    Exact duplicates are a special case (Jaccard 1.0), so this subsumes
    the fingerprint-equality stream for corpora where near-dup suppression
    is the contract. At 100 TB partition the bucket table by
    ``pmod(xxhash64(band_key), N)`` so each batch's candidate join prunes
    to its own buckets (the BM25 postings-store pattern).

    Returns the StreamingQuery.
    """
    import os

    from pyrope_spark.operators.dedup import with_minhash

    spark = stream.sparkSession
    rows_per_band = num_hashes // bands
    buckets_dir = os.path.join(index_dir, "buckets")
    fps_dir = os.path.join(index_dir, "fps")

    pre = stream.withWatermark(ts_col, watermark)

    def band_rows(sig: DataFrame) -> DataFrame:
        keys = F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band_no"),
                    F.concat_ws(
                        ":",
                        *[
                            F.col(f"mh_{bi * rows_per_band + j}").cast("string")
                            for j in range(rows_per_band)
                        ],
                    ).alias("band_key"),
                )
                for bi in range(bands)
            ]
        )
        return sig.select(
            F.col(id_col), F.explode(keys).alias("_b")
        ).select(id_col, "_b.band_no", "_b.band_key")

    def jaccard_dups(cand: DataFrame, left_fps: DataFrame, right_fps: DataFrame) -> DataFrame:
        """ids (left side) verified >= threshold against any right match."""
        j = (
            cand.join(left_fps.withColumnRenamed("_fps", "_lf"), "left_id")
            .join(right_fps.withColumnRenamed("_fps", "_rf"), "right_id")
            .withColumn(
                "_jac",
                F.when(
                    F.size(F.array_union("_lf", "_rf")) > 0,
                    F.size(F.array_intersect("_lf", "_rf"))
                    / F.size(F.array_union("_lf", "_rf")),
                ).otherwise(F.lit(0.0)),
            )
        )
        return j.filter(F.col("_jac") >= verify_threshold).select("left_id").distinct()

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        if not batch_df.take(1):
            return
        sig = with_minhash(
            batch_df, text_col=text_col, num_hashes=num_hashes,
            ngram_n=ngram_n, fps_col="_fps",
        ).cache()
        nb = band_rows(sig).cache()
        new_fps = sig.select(F.col(id_col), "_fps")

        drop = None
        # vs accepted corpus
        try:
            idx_b = spark.read.parquet(buckets_dir)
            idx_f = spark.read.parquet(fps_dir)
            cand = (
                nb.join(
                    idx_b.withColumnRenamed(id_col, "right_id"),
                    ["band_no", "band_key"],
                )
                .select(F.col(id_col).alias("left_id"), "right_id")
                .distinct()
            )
            drop = jaccard_dups(
                cand,
                new_fps.withColumnRenamed(id_col, "left_id"),
                idx_f.withColumnRenamed(id_col, "right_id"),
            )
        except AnalysisException:
            pass  # first batch: no index yet
        # in-flight, smaller id wins
        cand_in = (
            nb.alias("a")
            .join(nb.alias("b"), ["band_no", "band_key"])
            .filter(F.col(f"a.{id_col}") > F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("left_id"),
                F.col(f"b.{id_col}").alias("right_id"),
            )
            .distinct()
        )
        drop_in = jaccard_dups(
            cand_in,
            new_fps.withColumnRenamed(id_col, "left_id"),
            new_fps.withColumnRenamed(id_col, "right_id"),
        )
        drop = drop_in if drop is None else drop.unionByName(drop_in).distinct()

        survivors = sig.join(
            drop.withColumnRenamed("left_id", id_col), id_col, "left_anti"
        ).cache()
        survivors.select(*batch_df.columns).write.mode("append").parquet(corpus_dir)
        band_rows(survivors).write.mode("append").parquet(buckets_dir)
        survivors.select(F.col(id_col), "_fps").write.mode("append").parquet(fps_dir)
        survivors.unpersist()
        nb.unpersist()
        sig.unpersist()

    return (
        pre.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
