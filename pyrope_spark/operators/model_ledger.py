"""Model lifecycle ledger — the AI sidecar's versioned
register/deploy/canary/rollback state machine as an event-sourced SCD2-style
table (reference: ``src/Pyrope.AISidecar/model_manager.py:48-232``).

The reference mutates in-memory state behind a lock:

- ``_scan_models`` (:48-74): the staging dir is the registry; models sort by
  created_at desc. Batch analog: explicit ``register`` events.
- ``deploy_model`` (:117-141): canary deploy sets (canary_version,
  canary_tenants, streak:=0); active deploy sets active_version and — when
  promoting the current canary — clears the canary (:136-137). Deploying an
  unknown version raises ValueError (:123-124); the replay records it as a
  ``rejected`` row instead of dying mid-log.
- ``is_canary_tenant`` (:143-148): canary active AND (tenant set empty ->
  GLOBAL canary, else membership). One expression — see
  :func:`is_canary_tenant_expr`.
- ``rollback_model`` (:186-210): canary rollback clears (canary_version,
  canary_tenants); active rollback walks to the NEXT-OLDER registered
  version (models[current_idx + 1] in created-desc order) — i.e. the
  registration-order predecessor, which is static per version (versions
  registered after v are newer than v, so they never become v's
  predecessor), so the replay precomputes it with one lag window.
- canary p99 auto-rollback (:150-184) is the measurement loop — ported
  separately as ``operators/canary.py``; its rollback decision enters this
  ledger as a ``rollback_canary`` event.

Scale shape: the ledger is CONTROL-PLANE data — one event per human/ops
action, bounded by deployment cadence (thousands of rows over a system's
lifetime), not by corpus size. The state machine is inherently serial
(every transition reads the previous state), so the replay is ONE ordered
pass in a single task (``applyInPandas`` over a constant group) — exactly
the shape a serial KB-scale fold should have; the 100 TB side is the
REQUEST LOG the resulting state routes (:func:`route_requests_final`),
which is a broadcast join of the one-row final state against any request
volume. The DuckDB oracle replays the identical transitions as a recursive
CTE (the ewma precedent: one recursion level per event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: terminal statuses a replayed event can land in
APPLIED, REJECTED, NOOP = "applied", "rejected", "noop"

_LEDGER_SCHEMA = (
    "seq long, action string, version string, status string, "
    "active_version string, canary_version string, canary_tenants string"
)


def replay_model_lifecycle(
    events: DataFrame,
    *,
    seq_col: str = "seq",
    action_col: str = "action",
    version_col: str = "version",
    tenants_col: str = "tenants",
) -> DataFrame:
    """Replay a model-lifecycle event log into the SCD2-style ledger: one
    output row per event carrying the post-event state, so the state
    as-of any seq is one ``<=`` lookup and the current state is the last
    row (``valid_from = seq``, ``valid_to = next seq`` implicitly).

    Events (``action`` column): ``register`` (version enters staging —
    model_manager._scan_models), ``deploy_active`` / ``deploy_canary``
    (deploy_model with canary flag; ``tenants`` csv applies to canary,
    empty = global), ``rollback_canary``, ``rollback_active``
    (model_manager.rollback_model semantics incl. the no-predecessor
    noop).

    Output: (seq, action, version, status, active_version,
    canary_version, canary_tenants) — status ``applied`` / ``rejected``
    (deploy of an unregistered version, duplicate register) / ``noop``
    (rollback with nothing to roll back to).
    """
    import pandas as pd

    src = events.select(
        F.col(seq_col).cast("long").alias("seq"),
        F.col(action_col).alias("action"),
        F.col(version_col).alias("version"),
        F.coalesce(F.col(tenants_col), F.lit("")).alias("tenants"),
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        regs: list[str] = []  # registration order == seq order
        reg_set: set[str] = set()
        active = None
        canary = None
        canary_tenants = ""
        out = []
        for seq, action, version, tenants in zip(
            pdf["seq"], pdf["action"], pdf["version"], pdf["tenants"]
        ):
            status = APPLIED
            if action == "register":
                if version in reg_set:
                    status = REJECTED  # duplicate version id
                else:
                    regs.append(version)
                    reg_set.add(version)
            elif action == "deploy_active":
                if version not in reg_set:
                    status = REJECTED  # model_manager.py:123-124
                else:
                    active = version
                    if canary == version:  # promote clears canary (:136-137)
                        canary, canary_tenants = None, ""
            elif action == "deploy_canary":
                if version not in reg_set:
                    status = REJECTED
                else:
                    canary = version
                    canary_tenants = tenants or ""
            elif action == "rollback_canary":
                if canary is None:
                    status = NOOP  # "No canary to rollback" (:221)
                else:
                    canary, canary_tenants = None, ""
            elif action == "rollback_active":
                prev = None
                if active is not None and active in reg_set:
                    i = regs.index(active)
                    if i > 0:
                        prev = regs[i - 1]  # next-older (:205-208)
                if prev is None:
                    status = NOOP  # "No previous version" (:210)
                else:
                    active = prev
            else:
                status = REJECTED  # unknown action
            out.append(
                (int(seq), action, version, status, active, canary, canary_tenants)
            )
        return pd.DataFrame(
            out,
            columns=[
                "seq", "action", "version", "status",
                "active_version", "canary_version", "canary_tenants",
            ],
        )

    return (
        src.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(lambda _, pdf: replay(pdf), schema=_LEDGER_SCHEMA)
    )


def model_lifecycle_oracle_sql(events_sql: str) -> str:
    """DuckDB recursive-CTE twin of :func:`replay_model_lifecycle`:
    ``events_sql`` must yield (seq, action, version, tenants). One
    recursion level per event — identical transitions, identical
    statuses."""
    return f"""
WITH RECURSIVE ev AS (
  SELECT seq, action, version, COALESCE(tenants, '') AS tenants,
         row_number() OVER (ORDER BY seq) AS rn
  FROM ({events_sql})
), regs AS (
  -- registration order == seq order; duplicate registers are rejected, so
  -- only the FIRST occurrence of a version registers
  SELECT version, rn,
         lag(version) OVER (ORDER BY rn) AS prev_version
  FROM (
    SELECT version, rn,
           row_number() OVER (PARTITION BY version ORDER BY rn) AS occ
    FROM ev WHERE action = 'register'
  ) WHERE occ = 1
), rec AS (
  SELECT CAST(0 AS BIGINT) AS rn,
         CAST(NULL AS BIGINT) AS seq,
         CAST(NULL AS VARCHAR) AS action,
         CAST(NULL AS VARCHAR) AS version,
         CAST(NULL AS VARCHAR) AS status,
         CAST(NULL AS VARCHAR) AS active_version,
         CAST(NULL AS VARCHAR) AS canary_version,
         CAST('' AS VARCHAR) AS canary_tenants
  UNION ALL
  SELECT e.rn, e.seq, e.action, e.version,
         CASE
           WHEN e.action = 'register'
             THEN CASE WHEN g.version IS NOT NULL AND g.rn = e.rn
                       THEN 'applied' ELSE 'rejected' END
           WHEN e.action IN ('deploy_active', 'deploy_canary')
             THEN CASE WHEN g.version IS NOT NULL AND g.rn < e.rn
                       THEN 'applied' ELSE 'rejected' END
           WHEN e.action = 'rollback_canary'
             THEN CASE WHEN r.canary_version IS NULL THEN 'noop'
                       ELSE 'applied' END
           WHEN e.action = 'rollback_active'
             THEN CASE WHEN ga.prev_version IS NULL THEN 'noop'
                       ELSE 'applied' END
           ELSE 'rejected'
         END AS status,
         CASE
           WHEN e.action = 'deploy_active'
                AND g.version IS NOT NULL AND g.rn < e.rn THEN e.version
           WHEN e.action = 'rollback_active'
                AND ga.prev_version IS NOT NULL THEN ga.prev_version
           ELSE r.active_version
         END AS active_version,
         CASE
           WHEN e.action = 'deploy_canary'
                AND g.version IS NOT NULL AND g.rn < e.rn THEN e.version
           WHEN e.action = 'rollback_canary' THEN NULL
           WHEN e.action = 'deploy_active'
                AND g.version IS NOT NULL AND g.rn < e.rn
                AND r.canary_version IS NOT DISTINCT FROM e.version THEN NULL
           ELSE r.canary_version
         END AS canary_version,
         CASE
           WHEN e.action = 'deploy_canary'
                AND g.version IS NOT NULL AND g.rn < e.rn THEN e.tenants
           WHEN e.action = 'rollback_canary' THEN ''
           WHEN e.action = 'deploy_active'
                AND g.version IS NOT NULL AND g.rn < e.rn
                AND r.canary_version IS NOT DISTINCT FROM e.version THEN ''
           ELSE r.canary_tenants
         END AS canary_tenants
  FROM rec r
  JOIN ev e ON e.rn = r.rn + 1
  LEFT JOIN regs g ON g.version = e.version
  LEFT JOIN regs ga ON ga.version = r.active_version
)
SELECT seq, action, version, status,
       active_version, canary_version, canary_tenants
FROM rec WHERE rn > 0
"""


def is_canary_tenant_expr(
    tenant_col: F.Column,
    canary_version_col: F.Column,
    canary_tenants_col: F.Column,
) -> F.Column:
    """``ModelManager.is_canary_tenant`` (model_manager.py:143-148) as one
    expression: no canary -> False; empty tenant set -> GLOBAL canary
    (every tenant routes to it); else csv membership. ``canary_tenants``
    is the ledger's csv column."""
    tenants = F.coalesce(canary_tenants_col, F.lit(""))
    return canary_version_col.isNotNull() & (
        (tenants == "")
        | F.array_contains(F.split(tenants, ","), tenant_col)
    )


def route_requests_final(
    requests: DataFrame,
    ledger: DataFrame,
    *,
    tenant_col: str = "tenant_id",
) -> DataFrame:
    """Route a request log against the ledger's CURRENT state (last row):
    appends (model_version, is_canary) per request — canary tenants get
    the canary model, everyone else the active model. The one-row state
    broadcasts, so this scales to any request volume with zero shuffle of
    the request side."""
    from pyspark.sql import Window as W

    last = (
        ledger.withColumn(
            "_rk", F.row_number().over(W.orderBy(F.col("seq").desc()))
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col("active_version").alias("_active"),
            F.col("canary_version").alias("_canary"),
            F.col("canary_tenants").alias("_ctenants"),
        )
    )
    routed = requests.crossJoin(F.broadcast(last))
    is_canary = is_canary_tenant_expr(
        F.col(tenant_col), F.col("_canary"), F.col("_ctenants")
    )
    return routed.select(
        *requests.columns,
        F.when(is_canary, F.col("_canary"))
        .otherwise(F.col("_active"))
        .alias("model_version"),
        F.coalesce(is_canary, F.lit(False)).alias("is_canary"),
    )
