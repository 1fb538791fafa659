"""Streaming per-tenant QPS quota (G1) as a custom stateful operator.

Reference: per-tenant 1-second window counter with a max-QPS gate
(``Services/TenantQuotaEnforcer.cs:137-158``) — an online-serving concern the
batch engine documents out of scope. The *streaming* engine can express it
natively: ``applyInPandasWithState`` keyed by tenant keeps the rolling window
counter and emits per-(tenant, second) counts with an ``over_limit`` flag.

This is the template for the reference's other stateful loops (concurrency
leases G2, write-heat C6): key -> state struct -> per-batch pandas update.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "tenant_id string, window_s long, requests long, over_limit boolean"
STATE_SCHEMA = "window_s long, count long"


def quota_counter_fn(max_qps: int):
    """Build the applyInPandasWithState update function."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (tenant,) = key
        if state.exists:
            cur_window, cur_count = state.get
        else:
            cur_window, cur_count = -1, 0
        counts: dict[int, int] = {}
        for pdf in pdfs:
            secs = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
            for s in secs:
                counts[s] = counts.get(s, 0) + 1
        rows = []
        for s in sorted(counts):
            if s == cur_window:
                cur_count += counts[s]
            else:
                cur_window, cur_count = s, counts[s]
            rows.append((tenant, s, cur_count, cur_count > max_qps))
        state.update((cur_window, cur_count))
        yield pd.DataFrame(rows, columns=["tenant_id", "window_s", "requests", "over_limit"])

    return update


def streaming_qps_quota(
    requests: DataFrame, *, max_qps: int, tenant_col: str = "tenant_id", ts_col: str = "ts"
) -> DataFrame:
    """requests(tenant_id, ts) stream -> (tenant_id, window_s, requests,
    over_limit) updates. State = the current 1-second window counter per
    tenant, exactly the reference's enforcement unit."""
    src = requests.select(F.col(tenant_col).alias("tenant_id"), F.col(ts_col).alias("ts"))
    return src.groupBy("tenant_id").applyInPandasWithState(
        quota_counter_fn(max_qps),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------ G2 leases

LEASE_OUTPUT_SCHEMA = (
    "tenant_id string, request_id string, event string, granted boolean, "
    "active long, error_code string"
)
# NOTE state-schema migration: pre-round-3 checkpoints stored the state as
# "active long"; the granted-id set replaced it (denied/unknown releases
# must not decrement). applyInPandasWithState cannot read the old state
# shape — restart an existing leases query from a FRESH checkpoint after
# upgrading (in-flight lease counts reset to empty, matching a restart of
# the reference's in-memory enforcer).
LEASE_STATE_SCHEMA = "granted array<string>"


def lease_fn(max_concurrent: int):
    """Build the applyInPandasWithState update function for concurrency
    leases (reference TryEnterConcurrent/ReleaseConcurrent,
    ``Services/TenantQuotaEnforcer.cs:50-90,162-185``): a begin event is
    granted while the tenant's active count is below the limit, denied with
    the reference's Busy code otherwise; an end event releases a lease.

    Like the reference — where releasing requires the lease object handed
    out by a *successful* TryEnterConcurrent — only request_ids with a
    granted begin hold a lease: the state is the set of granted ids, so an
    'end' for a denied or unknown request_id (NO_LEASE), a duplicate begin
    for a live lease (DUPLICATE), and unrecognized event values
    (UNKNOWN_EVENT) are all reported but change nothing. Events are applied
    in (ts, request_id) order per batch for determinism."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (tenant,) = key
        granted: list[str] = list(state.get[0]) if state.exists else []
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            state.update((granted,))
            return
        allp = pd.concat(batches).sort_values(["ts", "request_id"])
        rows = []
        for r in allp.itertuples(index=False):
            rid = r.request_id
            if r.event == "begin":
                if rid in granted:
                    rows.append((tenant, rid, "begin", False, len(granted), "DUPLICATE"))
                elif len(granted) < max_concurrent:
                    granted.append(rid)
                    rows.append((tenant, rid, "begin", True, len(granted), None))
                else:
                    rows.append((tenant, rid, "begin", False, len(granted), "BUSY"))
            elif r.event == "end":
                if rid in granted:
                    granted.remove(rid)
                    rows.append((tenant, rid, "end", True, len(granted), None))
                else:
                    rows.append((tenant, rid, "end", False, len(granted), "NO_LEASE"))
            else:
                rows.append((tenant, rid, r.event, False, len(granted), "UNKNOWN_EVENT"))
        state.update((granted,))
        yield pd.DataFrame(
            rows,
            columns=[
                "tenant_id", "request_id", "event", "granted", "active", "error_code",
            ],
        )

    return update


def streaming_concurrency_leases(
    events: DataFrame,
    *,
    max_concurrent: int,
    tenant_col: str = "tenant_id",
    ts_col: str = "ts",
    request_col: str = "request_id",
    event_col: str = "event",
) -> DataFrame:
    """events(tenant_id, request_id, ts, event in {'begin','end'}) stream ->
    per-event lease decisions with the running active count. State = the
    per-tenant set of granted (live) request_ids, exactly the reference's
    concurrency unit (G2) — the serving-loop lease expressed as a stateful
    streaming operator. An 'end' without a granted 'begin' does NOT release
    anything (NO_LEASE), mirroring the reference's lease-object contract."""
    src = events.select(
        F.col(tenant_col).alias("tenant_id"),
        F.col(request_col).alias("request_id"),
        F.col(ts_col).alias("ts"),
        F.col(event_col).alias("event"),
    )
    return src.groupBy("tenant_id").applyInPandasWithState(
        lease_fn(max_concurrent),
        outputStructType=LEASE_OUTPUT_SCHEMA,
        stateStructType=LEASE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
