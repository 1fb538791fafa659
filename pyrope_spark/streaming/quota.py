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
