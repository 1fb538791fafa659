"""Streaming sketch maintenance + stream-stream joins.

Two streaming twins of batch capabilities:

- :func:`streaming_hll_update` — incremental HLL distinct state: each
  micro-batch's keys fold into a durable register table (union + max —
  the lossless merge), so "distinct users ever seen (per group)" is
  maintained at a bounded state size (m registers per group) no matter
  how many events stream through. The pattern generalizes to any
  sketch-as-a-table artifact in this engine (CMS: sum counters;
  bottom-k: union + cut; bloom: union of set bits).
- :func:`streaming_attribution_join` — the canonical watermarked
  stream-stream interval join (impression -> click within a window),
  Spark's native stream-stream join with event-time bounds so both
  sides' state stores are GC-ed by the watermark.

State swap discipline (same as the incremental BM25 postings update,
fulltext.update_bm25_index): the merged registers are written to a tmp
dir while the plan still reads the old files, then swapped in — never an
in-place overwrite of inputs the running plan depends on.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _swap_state_dir(tmp: str, state_dir: str) -> None:
    """Promote a fully-written tmp state dir: rename live ASIDE, promote
    tmp, drop the backup (ADVICE r4: rmtree-then-replace left a window
    with the data only under .tmp — every crash point here leaves a
    recoverable directory at a known name, same discipline as
    fulltext.update_bm25_index and storage.forget_keys)."""
    bak = state_dir.rstrip("/") + ".bak"
    if os.path.isdir(bak):
        shutil.rmtree(bak)
    if os.path.isdir(state_dir):
        os.replace(state_dir, bak)
    os.replace(tmp, state_dir)
    if os.path.isdir(bak):
        shutil.rmtree(bak)


_BATCH_MARKER = "_last_batch_id"


def _read_marker(state_dir: str) -> tuple[int, str | None] | None:
    """Read the (batch_id, stream_id) high-water marker, tolerating the
    legacy bare-int format (pre-r9 markers carry no stream identity)."""
    try:
        with open(os.path.join(state_dir, _BATCH_MARKER)) as fh:
            raw = fh.read().strip()
    except OSError:
        return None
    try:
        obj = json.loads(raw)
        if isinstance(obj, dict):
            return int(obj["batch_id"]), obj.get("stream_id")
    except (ValueError, KeyError, TypeError):
        pass
    try:
        return int(raw), None
    except ValueError:
        return None


def _replay_guard(state_dir: str, checkpoint_dir: str | None) -> int | None:
    """Batch-id high-water mark stored WITH the state: an
    underscore-prefixed file inside the parquet dir (Spark's reader
    ignores it, like ``_SUCCESS``), written into the tmp dir BEFORE the
    atomic swap so the marker and the merged counters commit together.

    foreachBatch is at-least-once: a micro-batch replayed after a crash
    between the state swap and the checkpoint commit would double-count
    any SUM-merged state (r7 ADVICE).  Idempotent merges (HLL max,
    bottom-k union+cut) don't need the guard; every sum-merge in this
    module checks it and skips replays, making the counter state
    exactly-once.

    Batch ids are only meaningful WITHIN one checkpointed stream — a
    fresh checkpoint (or a checkpoint-less run) restarts them at 0, so
    "batch_id <= last" against another stream's marker would silently
    drop NEW data (r8 ADVICE).  The marker therefore records the owning
    checkpoint path, and the guard:

    - returns the high-water mark only for the SAME stream (resume with
      the original checkpoint_dir — the supported replay case);
    - raises on a different checkpoint, or on a checkpoint-less run,
      against marker-carrying state: the engine cannot distinguish a
      replay from new data there, and silent skipping loses data while
      merging double-counts.  The caller must resume the original
      checkpoint or start a fresh state_dir.

    A legacy bare-int marker (no stream id) is honored for any
    checkpointed stream so pre-r9 state dirs keep resuming.
    """
    marker = _read_marker(state_dir)
    if marker is None:
        return None
    last, owner = marker
    if checkpoint_dir is None:
        raise ValueError(
            f"state_dir {state_dir!r} carries an exactly-once batch marker "
            "but this run has no checkpoint_dir: batch ids restart at 0 "
            "every run, so replays are indistinguishable from new data. "
            "Pass the original checkpoint_dir to resume, or point at a "
            "fresh state_dir."
        )
    sid = os.path.abspath(checkpoint_dir)
    if owner is not None and owner != sid:
        raise ValueError(
            f"state_dir {state_dir!r} was written by the stream "
            f"checkpointed at {owner!r}; this run checkpoints at {sid!r}. "
            "A different stream's batch ids restart at 0, so the replay "
            "guard would silently drop its data. Resume with the original "
            "checkpoint_dir, or start a fresh state_dir."
        )
    return last


def _stamp_batch_id(
    tmp_dir: str, batch_id: int, checkpoint_dir: str | None
) -> None:
    """Write the high-water mark (+ owning checkpoint path) into the
    not-yet-swapped tmp dir so the rename in :func:`_swap_state_dir`
    commits marker+state atomically.  Checkpoint-less runs stamp no
    marker — without a stable stream identity the guard cannot tell a
    replay from new data, so they stay (visibly) at-least-once."""
    if checkpoint_dir is None:
        return
    with open(os.path.join(tmp_dir, _BATCH_MARKER), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "batch_id": int(batch_id),
                    "stream_id": os.path.abspath(checkpoint_dir),
                }
            )
        )


def streaming_hll_update(
    stream_df: DataFrame,
    state_dir: str,
    *,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
):
    """Maintain an HLL register table under ``state_dir`` from a stream.

    Each micro-batch: build the batch's registers (bounded: m = 2^p rows
    per group regardless of batch size), merge with the stored table
    (groupBy max — exactly ``hll_merge``), tmp+swap the result. Estimates
    at any time via ``hll_estimate(spark.read.parquet(state_dir), p=p)``.

    Returns the StreamingQuery handle.
    """
    from pyrope_spark.operators.sketch import hll_build, hll_merge

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        regs = hll_build(batch, key_col, group_cols=group_cols, p=p)
        if os.path.isdir(state_dir):
            old = spark.read.parquet(state_dir)
            regs = hll_merge(old, regs, group_cols=group_cols)
        tmp = state_dir.rstrip("/") + ".tmp"
        regs.write.mode("overwrite").parquet(tmp)  # materialized off old files
        _swap_state_dir(tmp, state_dir)

    w = stream_df.writeStream.foreachBatch(upd).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_attribution_join(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    key_col: str = "user_id",
    imp_ts_col: str = "ts",
    click_ts_col: str = "ts",
    window_s: int = 600,
    watermark: str = "20 minutes",
    imp_cols: tuple[str, ...] = (),
    click_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Watermarked stream-stream interval join: each click matches the
    impressions of the same key in the ``window_s`` seconds before it.

    Both sides carry a watermark AND the join condition bounds event time
    in both directions — the two requirements for Spark to GC each side's
    join state (otherwise the state store grows without bound). Late rows
    beyond the watermark drop.

    Output: (key, impression_ts, click_ts, imp_cols..., click_cols...).
    """
    imp = (
        impressions.select(
            F.col(key_col).alias("_k"),
            F.col(imp_ts_col).alias("impression_ts"),
            *[F.col(c).alias(f"imp_{c}") for c in imp_cols],
        )
        .withWatermark("impression_ts", watermark)
    )
    clk = (
        clicks.select(
            F.col(key_col).alias("_ck"),
            F.col(click_ts_col).alias("click_ts"),
            *[F.col(c).alias(f"click_{c}") for c in click_cols],
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (F.col("_k") == F.col("_ck"))
        & (F.col("click_ts") >= F.col("impression_ts"))
        & (
            F.col("click_ts")
            <= F.col("impression_ts") + F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    return (
        imp.join(clk, cond, "inner")
        .drop("_ck")
        .withColumnRenamed("_k", key_col)
    )


def streaming_bottomk_update(
    stream_df: DataFrame,
    state_dir: str,
    k: int,
    *,
    id_col: str,
    keep_cols: tuple[str, ...] = (),
    group_cols: tuple[str, ...] = (),
    checkpoint_dir: str | None = None,
):
    """Maintain a bottom-k sample sketch under ``state_dir`` from a stream:
    per batch, cut the batch to its bottom-k, merge with the stored sketch
    (union + global cut — ``bottomk_merge``, lossless), tmp+swap. The
    durable uniform sample of everything ever streamed, at k rows per
    group of state. Quantiles at any time via
    ``nearest_rank_percentiles(spark.read.parquet(state_dir), ...)``."""
    from pyrope_spark.operators.sketch import bottomk_merge, bottomk_sample

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        sk = bottomk_sample(
            batch, k, id_col=id_col, keep_cols=keep_cols, group_cols=group_cols
        )
        if os.path.isdir(state_dir):
            old = spark.read.parquet(state_dir)
            sk = bottomk_merge(old, sk, k, group_cols=group_cols)
        tmp = state_dir.rstrip("/") + ".tmp"
        sk.write.mode("overwrite").parquet(tmp)
        _swap_state_dir(tmp, state_dir)

    w = stream_df.writeStream.foreachBatch(upd).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def streaming_cms_update(
    stream_df: DataFrame,
    state_dir: str,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    checkpoint_dir: str | None = None,
):
    """Maintain a count-min sketch under ``state_dir`` from a document
    stream: per batch, build the batch's (d, bucket, cnt) increments and
    SUM-merge with the stored counters (CMS merge = counter addition —
    lossless, like every sketch in this family), tmp+swap. Heavy-hitter
    estimates at any time via ``cms_estimate(spark.read.parquet(state_dir),
    terms, depth=depth, width=width)``. State is bounded at d x width rows
    forever."""
    from pyrope_spark.operators.sketch import cms_build

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        last = _replay_guard(state_dir, checkpoint_dir)
        if last is not None and batch_id <= last:
            return  # same-stream replay: counters already include it
        sk = cms_build(batch, text_col=text_col, depth=depth, width=width)
        if os.path.isdir(state_dir):
            old = spark.read.parquet(state_dir)
            sk = (
                old.unionByName(sk)
                .groupBy("d", "bucket")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        tmp = state_dir.rstrip("/") + ".tmp"
        sk.write.mode("overwrite").parquet(tmp)
        _stamp_batch_id(tmp, batch_id, checkpoint_dir)
        _swap_state_dir(tmp, state_dir)

    w = stream_df.writeStream.foreachBatch(upd).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def streaming_ewma(
    stream_df: DataFrame,
    alpha: float,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    deviation_threshold: float | None = None,
):
    """Stateful streaming twin of ``temporal.ewma``: one smoothed value per
    key maintained across micro-batches via ``applyInPandasWithState``
    (state = a single double per key — the minimal stateful-operator
    shape). Emits (key, ts_us, value, ewma[, deviates]) per event;
    ``deviation_threshold`` additionally flags |value - prior ewma| >
    threshold — the smoothed-baseline alarm, online.

    Within a batch events order by (ts, value) for a deterministic fold;
    cross-batch order is arrival order (streaming semantics — the batch
    operator is the oracle-grade path).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)
    out_schema = f"{key_col} string, ts_us long, value double, ewma double, deviates boolean"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        s = state.get[0] if state.exists else None
        rows = []
        # concat BEFORE sorting: Arrow delivers a micro-batch as several
        # chunks in arbitrary order, so a per-chunk sort folds events out
        # of order under load (r9 flake caught by the full suite running
        # next to the sf1 gate)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", value_col])
            ts_us = (batch["ts"].astype("int64") // 1_000).tolist()
            for t, x in zip(ts_us, batch[value_col].tolist()):
                dev = (
                    s is not None
                    and deviation_threshold is not None
                    and abs(x - s) > deviation_threshold
                )
                s = x if s is None else a * x + (1.0 - a) * s
                rows.append((k, t, x, round(s, 6), bool(dev)))
        if s is not None:
            state.update((float(s),))
        yield pd.DataFrame(
            rows, columns=[key_col, "ts_us", "value", "ewma", "deviates"]
        )

    src = stream_df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias(value_col),
    )
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="s double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_holt(
    stream_df: DataFrame,
    alpha: float,
    beta: float,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    surprise_threshold: float | None = None,
):
    """Stateful streaming twin of ``temporal.holt``: (level, trend) per key
    across micro-batches via ``applyInPandasWithState``. Emits (key, ts_us,
    value, level, trend, forecast[, surprised]) per event, where forecast
    is the PRIOR state's one-step prediction l + b — so
    ``surprise_threshold`` flags |x - (l + b)| > threshold against what the
    model expected BEFORE seeing x (the trend-aware alarm; plain
    [[streaming_ewma]] lags trending series and false-alarms on them).

    Within a batch events order by (ts, value) for a deterministic fold;
    cross-batch order is arrival order (streaming semantics — the batch
    operator carries the oracle)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)
    bt = float(beta)
    out_schema = (
        f"{key_col} string, ts_us long, value double, level double, "
        "trend double, forecast double, surprised boolean"
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        lb = state.get if state.exists else None
        rows = []
        # one concat+sort across the whole micro-batch (chunk order is
        # arbitrary — the ewma fold's r9 flake note applies here too)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", value_col])
            ts_us = (batch["ts"].astype("int64") // 1_000).tolist()
            for t, x in zip(ts_us, batch[value_col].tolist()):
                if lb is None:
                    fc = None
                    surprised = False
                    lb = (float(x), 0.0)
                else:
                    l0, b0 = lb
                    fc = l0 + b0
                    surprised = (
                        surprise_threshold is not None
                        and abs(x - fc) > surprise_threshold
                    )
                    l = a * x + (1.0 - a) * (l0 + b0)
                    lb = (l, bt * (l - l0) + (1.0 - bt) * b0)
                rows.append(
                    (k, t, x, round(lb[0], 6), round(lb[1], 6),
                     round(fc, 6) if fc is not None else None,
                     bool(surprised))
                )
        if lb is not None:
            state.update((float(lb[0]), float(lb[1])))
        yield pd.DataFrame(
            rows,
            columns=[key_col, "ts_us", "value", "level", "trend",
                     "forecast", "surprised"],
        )

    src = stream_df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias(value_col),
    )
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="l double, b double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_agg_view_maintain(
    stream_df: DataFrame,
    state_dir: str,
    *,
    keys: list[str],
    value_col: str = "value",
    op_col: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
):
    """Streaming twin of ``maintenance.maintain_agg_view``: each
    micro-batch's changelog rows (op ±1 for retractions) fold into the
    per-key (n, sum_value) table under ``state_dir`` via the union +
    re-agg merge — the continuously-maintained materialized view.
    Because the merged sum is exact decimal, the state after any prefix
    of batches is BIT-IDENTICAL to a batch rebuild over the same rows —
    the parity the pytest asserts — so batch and streaming paths can
    audit each other.  State size is |view keys|, not |history|; the
    tmp+swap keeps every crash point recoverable.
    """
    from pyrope_spark.operators.maintenance import (
        build_agg_view,
        maintain_agg_view,
    )

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        last = _replay_guard(state_dir, checkpoint_dir)
        if last is not None and batch_id <= last:
            return  # same-stream replay: view already includes it
        if os.path.isdir(state_dir):
            base = spark.read.parquet(state_dir)
            merged = maintain_agg_view(
                base, batch, keys=keys, value_col=value_col, op_col=op_col
            )
        else:
            merged = build_agg_view(
                batch, keys=keys, value_col=value_col, op_col=op_col
            ).filter(F.col("n") > 0)
        tmp = state_dir.rstrip("/") + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _stamp_batch_id(tmp, batch_id, checkpoint_dir)
        _swap_state_dir(tmp, state_dir)

    w = stream_df.writeStream.foreachBatch(upd).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_histogram_drift(
    stream_df: DataFrame,
    state_dir: str,
    baseline: DataFrame,
    *,
    key_col: str = "k",
    value_col: str = "value",
    n_bins: int = 10,
    vmin: int = 0,
    vmax: int = 1_000_000,
    scale: int = 1_000_000,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
):
    """Streaming drift monitor: per micro-batch, fold (key, bin) counts
    into the running histogram state and score it against a FROZEN
    baseline histogram (the training-time distribution) with the same
    ln-free L1-in-ppm statistic as the batch ``profile.histogram_drift``.

    Bin bounds are FIXED (``vmin``/``vmax`` micro-units, the baseline's
    observed range) rather than re-derived per batch — a moving range
    would re-bin history and break the fold's additivity; out-of-range
    values clamp into the edge bins, which is itself a drift signal.
    Counts are a commutative monoid, so state after any prefix of
    batches is EXACTLY the batch histogram over the same rows (the
    pytest parity), and the drift table under ``{state_dir}.drift`` is
    recomputed per batch from histogram-sized data only.
    """
    bspec = (
        baseline.select(
            F.col(key_col).alias("k"),
            _hist_bin(value_col, n_bins, vmin, vmax, scale).alias("bin"),
        )
        .groupBy("k", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_base"))
    )

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        last = _replay_guard(state_dir, checkpoint_dir)
        replay = last is not None and batch_id <= last
        if not replay:
            inc = (
                batch.select(
                    F.col(key_col).alias("k"),
                    _hist_bin(value_col, n_bins, vmin, vmax, scale).alias(
                        "bin"
                    ),
                )
                .groupBy("k", "bin")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
            )
            if os.path.isdir(state_dir):
                base = spark.read.parquet(state_dir)
                merged = (
                    base.unionByName(inc)
                    .groupBy("k", "bin")
                    .agg(F.sum("n").cast("long").alias("n"))
                )
            else:
                merged = inc
            tmp = state_dir.rstrip("/") + ".tmp"
            merged.write.mode("overwrite").parquet(tmp)
            _stamp_batch_id(tmp, batch_id, checkpoint_dir)
            _swap_state_dir(tmp, state_dir)

        # score the running histogram vs the frozen baseline (cell-table
        # sized work; same integer div shares as the batch operator).
        # Runs on SKIPPED replays too (r8 ADVICE): a crash after the
        # state swap but before the drift write leaves {state_dir}.drift
        # one batch behind the committed state — recomputing from the
        # committed histogram here repairs it on the replay instead of
        # waiting for the next live batch.
        cur = spark.read.parquet(state_dir)
        cells = (
            bspec.select("k", "bin", "n_base")
            .join(
                cur.select(
                    F.col("k").alias("ck"), F.col("bin").alias("cbin"),
                    F.col("n").alias("n_cur"),
                ),
                (F.col("k") == F.col("ck")) & (F.col("bin") == F.col("cbin")),
                "full_outer",
            )
            .select(
                F.coalesce(F.col("k"), F.col("ck")).alias("k"),
                F.coalesce(F.col("n_base"), F.lit(0)).alias("n_base"),
                F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
            )
        )
        tot = cells.groupBy(F.col("k").alias("tk")).agg(
            F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
        )
        drift = (
            cells.join(tot, F.col("k") == F.col("tk"))
            .select(
                "k",
                F.when(F.col("tb") > 0, F.expr(f"n_base * {scale} div tb"))
                .otherwise(F.lit(0)).alias("bp"),
                F.when(F.col("tc") > 0, F.expr(f"n_cur * {scale} div tc"))
                .otherwise(F.lit(0)).alias("cp"),
            )
            .groupBy("k")
            .agg(
                F.sum(F.abs(F.col("cp") - F.col("bp")))
                .cast("long")
                .alias("l1_drift_ppm")
            )
            # a skipped replay re-scores the state committed at `last`
            .withColumn(
                "batch_id",
                F.lit(last if replay else batch_id).cast("long"),
            )
        )
        dtmp = state_dir.rstrip("/") + ".drift.tmp"
        drift.write.mode("overwrite").parquet(dtmp)
        _swap_state_dir(dtmp, state_dir.rstrip("/") + ".drift")

    w = stream_df.writeStream.foreachBatch(upd).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def _hist_bin(value_col: str, n_bins: int, vmin: int, vmax: int, scale: int):
    """Fixed-bounds bin assignment (clamped to edge bins) in micro-units."""
    raw = F.expr(
        f"(CAST(round({value_col} * {scale}) AS BIGINT) - {vmin})"
        f" * {n_bins} div ({vmax} - {vmin} + 1)"
    )
    return F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)).cast("long")


def streaming_debounce(
    stream_df: DataFrame,
    gap_s: int,
    *,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_ns_col: str = "ts_ns",
    id_col: str = "event_id",
):
    """Stateful streaming twin of ``temporal.debounce_events``: per key,
    only the first event of each burst (gap > ``gap_s`` from the
    PREVIOUS event) passes; the rest are suppressed online — the
    at-the-edge telemetry dedup that keeps retry storms out of the
    corpus entirely instead of cleaning them up in batch.

    State per key = the last seen event's ts (one BIGINT — the minimal
    stateful shape). Within a micro-batch events fold in (ts, id) order;
    with in-order arrival across batches the survivor set equals the
    batch operator's exactly (the batch op is the oracle-grade path —
    parity asserted in tests). Emits one row per surviving event:
    (key_cols..., ts_ns, event_id, n_suppressed_before) where
    ``n_suppressed_before`` counts the suppressed tail of the PREVIOUS
    burst — so burst sizes stream out as soon as the next burst opens.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = int(gap_s) * 1_000_000_000
    key_schema = ", ".join(f"{k} string" for k in key_cols)
    out_schema = (
        f"{key_schema}, ts_ns long, event_id long, n_suppressed_before long"
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, supp = (
            (state.get[0], state.get[1]) if state.exists else (None, 0)
        )
        rows = []
        # concat before sort: per-chunk sorting folds out of order when
        # Arrow splits the micro-batch (r9 flake class)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values([ts_ns_col, id_col])
            for t, eid in zip(
                batch[ts_ns_col].tolist(), batch[id_col].tolist()
            ):
                if last_ts is None or t - last_ts > gap_ns:
                    rows.append((*key, int(t), int(eid), int(supp)))
                    supp = 0
                else:
                    supp += 1
                last_ts = t
        state.update((int(last_ts), int(supp)))
        yield pd.DataFrame(
            rows,
            columns=[*key_cols, "ts_ns", "event_id", "n_suppressed_before"],
        )

    src = stream_df.select(
        *[F.col(k).cast("string").alias(k) for k in key_cols],
        F.col(ts_ns_col).cast("long").alias(ts_ns_col),
        F.col(id_col).cast("long").alias(id_col),
    )
    return src.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="last_ts long, supp long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_interval_coverage(
    stream_df: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "start_s",
    end_col: str = "end_s",
):
    """Stateful streaming twin of ``temporal.interval_union_coverage``:
    per key, maintain (covered_s, n_intervals, n_segments, seg_start,
    seg_end) across micro-batches and emit the running totals after each
    batch — "how much active time has this user accumulated so far",
    online.

    Intervals are assumed start-ordered ACROSS batches per key (the
    at-the-edge shape: trackers emit sessions in order); within a batch
    they are sorted before folding, so out-of-order arrivals inside one
    batch are handled.  With in-order arrival the emitted totals equal
    the batch operator's exactly — parity asserted in tests (the batch
    op is the oracle-grade path).

    State per key = 5 BIGINTs; output mode append, one row per
    (key, batch) with the running coverage.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} string, n_intervals long, n_segments long, "
        "covered_s long, open_start_s long, open_end_s long"
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_iv, n_seg, covered, seg_s, seg_e = state.get
        else:
            n_iv, n_seg, covered, seg_s, seg_e = 0, 0, 0, None, None
        # concat before sort (r9 flake class: chunk order is arbitrary)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch[batch[end_col] >= batch[start_col]]
            batch = batch.sort_values([start_col, end_col])
            for s, e in zip(
                batch[start_col].tolist(), batch[end_col].tolist()
            ):
                s, e = int(s), int(e)
                n_iv += 1
                if seg_s is None:
                    n_seg, seg_s, seg_e = 1, s, e
                elif s > seg_e:
                    covered += seg_e - seg_s   # close the open segment
                    n_seg += 1
                    seg_s, seg_e = s, e
                else:
                    seg_e = max(seg_e, e)
        state.update((
            int(n_iv), int(n_seg), int(covered),
            int(seg_s if seg_s is not None else -1),
            int(seg_e if seg_e is not None else -1),
        ))
        total = covered + ((seg_e - seg_s) if seg_s is not None else 0)
        yield pd.DataFrame(
            [(key[0], int(n_iv), int(n_seg), int(total),
              int(seg_s if seg_s is not None else -1),
              int(seg_e if seg_e is not None else -1))],
            columns=[key_col, "n_intervals", "n_segments", "covered_s",
                     "open_start_s", "open_end_s"],
        )

    src = stream_df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(start_col).cast("long").alias(start_col),
        F.col(end_col).cast("long").alias(end_col),
    )
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=(
            "n_iv long, n_seg long, covered long, seg_s long, seg_e long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_transition_deltas(
    stream_df: DataFrame,
    *,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts_ns",
    id_col: str = "event_id",
):
    """Stateful streaming maintenance of the [[transition_matrix]] model:
    per user, carry the LAST state across micro-batches and emit one
    ``(prev_state, next_state, cnt)`` DELTA row per batch-and-pair —
    downstream, ``SUM(cnt) GROUP BY prev, next`` over the delta log
    reproduces the batch matrix exactly (pytest-asserted), so the model
    table stays fresh without ever rescanning history.

    State per user = one string (the last state); in-batch events fold
    in (ts, id) order.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "prev_state string, next_state string, cnt long"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        counts: dict[tuple, int] = {}
        # concat before sort (r9 flake class: chunk order is arbitrary)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values([ts_col, id_col])
            for st in batch[state_col].tolist():
                if last is not None:
                    k = (last, st)
                    counts[k] = counts.get(k, 0) + 1
                last = st
        if last is not None:
            state.update((str(last),))
        yield pd.DataFrame(
            [(p, nx, c) for (p, nx), c in counts.items()],
            columns=["prev_state", "next_state", "cnt"],
        )

    src = stream_df.select(
        F.col(user_col).cast("string").alias(user_col),
        F.col(state_col).cast("string").alias(state_col),
        F.col(ts_col).cast("long").alias(ts_col),
        F.col(id_col).cast("long").alias(id_col),
    )
    return src.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="last_state string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_pchart_maintain(
    stream_df: DataFrame,
    state_dir: str,
    *,
    group_col: str = "grp",
    flag_col: str = "flagged",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
):
    """Streaming maintenance of the [[proportion_control_chart]]
    counters: each micro-batch folds per-group ``(n, flagged)`` deltas
    into the counter table under ``state_dir`` (union + re-agg merge,
    the [[streaming_agg_view_maintain]] discipline).  Running
    [[pchart_readout]] over the state table after any prefix of batches
    is BIT-IDENTICAL to the batch chart over the same rows — integer
    counters have no merge-order sensitivity — so the alarm can sit on
    the live stream while audits replay batch.  State size is |groups|,
    not |history|.

    Exactly-once under at-least-once foreachBatch: the last-applied
    batch_id is stamped into the state dir atomically with the swap
    (r7 ADVICE), so a micro-batch replayed after a crash between the
    swap and the checkpoint commit is skipped, never double-counted.
    Requires ``checkpoint_dir`` — the marker is bound to the owning
    checkpoint (r8 ADVICE: another stream's batch ids restart at 0, so
    an unbound marker would silently drop its new data); checkpoint-less
    runs stamp nothing and stay visibly at-least-once.
    """

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        last = _replay_guard(state_dir, checkpoint_dir)
        if last is not None and batch_id <= last:
            return  # same-stream replay: counters already include it
        delta = batch.groupBy(F.col(group_col).alias("grp")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(flag_col).cast("int")).cast("long").alias("flagged"),
        )
        if os.path.isdir(state_dir):
            base = spark.read.parquet(state_dir)
            merged = (
                base.unionByName(delta)
                .groupBy("grp")
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.sum("flagged").cast("long").alias("flagged"),
                )
            )
        else:
            merged = delta
        tmp = state_dir.rstrip("/") + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _stamp_batch_id(tmp, batch_id, checkpoint_dir)
        _swap_state_dir(tmp, state_dir)

    w = stream_df.writeStream.foreachBatch(upd).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_novelty_maintain(
    stream_df: DataFrame,
    state_dir: str,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    scale: int = 1_000_000,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
):
    """Streaming twin of [[ngram_novelty_per_doc]]: documents arrive in
    id order (the ingest contract), each micro-batch scores its docs'
    shingles against the ACCUMULATED first-owner set, emits per-doc
    novelty rows to ``out_dir``, and folds the batch's new fingerprints
    into the state (min-id merge, tmp+swap).  Because the first owner of
    a fingerprint is ``min(id)`` and ids arrive monotonically, the
    streamed scores are IDENTICAL to running the batch operator over the
    full corpus (pytest-asserted) — the online curation gate that scores
    novelty at ingest time instead of re-scanning the corpus.

    State size is |distinct fingerprints|, not |history rows|; each
    batch touches the state once (union + min merge).

    Exactly-once under at-least-once foreachBatch (r7 ADVICE): the
    min-id state merge is naturally idempotent, and the per-doc rows
    land in a ``batch_id=N`` partition of ``out_dir`` via dynamic
    partition overwrite, so a replayed micro-batch rewrites its own
    partition instead of appending duplicates.  Readers of ``out_dir``
    see an extra ``batch_id`` partition column.
    """
    from pyrope_spark.operators.dedup import token_fps

    def upd(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        last = _replay_guard(state_dir, checkpoint_dir)
        if last is not None and batch_id <= last:
            return  # replay after full commit: out partition + state exist
        fps = batch.select(
            F.col(id_col).alias("id"),
            F.explode(token_fps(F.col(text_col), ngram_n)).alias("fp"),
        ).distinct().persist()
        batch_firsts = fps.groupBy("fp").agg(F.min("id").alias("first_id"))
        if os.path.isdir(state_dir):
            base = spark.read.parquet(state_dir)
            # a fp already owned by an earlier (smaller-id) doc is not
            # novel for anyone in this batch
            firsts = (
                base.unionByName(batch_firsts)
                .groupBy("fp")
                .agg(F.min("first_id").alias("first_id"))
            )
        else:
            firsts = batch_firsts
        firsts = firsts.persist()
        out = (
            fps.join(firsts, "fp")
            .groupBy(F.col("id").alias(id_col))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles"),
                F.sum((F.col("first_id") == F.col("id")).cast("int"))
                .cast("long").alias("n_novel"),
            )
            .withColumn(
                "novelty_ppm",
                F.expr(
                    f"CAST(CAST(n_novel AS DECIMAL(38,0)) * {scale} "
                    f"DIV n_shingles AS BIGINT)"
                ),
            )
        )
        (
            out.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        tmp = state_dir.rstrip("/") + ".tmp"
        firsts.write.mode("overwrite").parquet(tmp)
        _stamp_batch_id(tmp, batch_id, checkpoint_dir)
        _swap_state_dir(tmp, state_dir)
        fps.unpersist()
        firsts.unpersist()

    w = stream_df.writeStream.foreachBatch(upd).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
