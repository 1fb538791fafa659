"""Model lifecycle ledger (operators/model_ledger.py —
model_manager.py:48-232 contracts)."""

from pyspark.sql import functions as F


def _replay(spark, rows):
    from pyrope_spark.operators.model_ledger import replay_model_lifecycle

    ev = spark.createDataFrame(
        rows, "seq long, action string, version string, tenants string"
    )
    return {r["seq"]: r for r in replay_model_lifecycle(ev).collect()}


def test_register_deploy_promote_clears_canary(spark):
    """deploy_model: canary deploy sets (version, tenants); promoting the
    canary to active CLEARS the canary (model_manager.py:136-137)."""
    out = _replay(spark, [
        (1, "register", "v1", ""),
        (2, "register", "v2", ""),
        (3, "deploy_active", "v1", ""),
        (4, "deploy_canary", "v2", "tA,tB"),
        (5, "deploy_active", "v2", ""),   # promote -> canary cleared
    ])
    assert out[3]["active_version"] == "v1"
    assert out[4]["canary_version"] == "v2"
    assert out[4]["canary_tenants"] == "tA,tB"
    assert out[5]["active_version"] == "v2"
    assert out[5]["canary_version"] is None
    assert out[5]["canary_tenants"] == ""


def test_unknown_version_rejected_and_rollbacks(spark):
    """Deploying an unregistered version is rejected (ValueError at
    model_manager.py:123-124, surfaced as a status row); rollback_active
    walks to the next-older registered version (:205-208), noop when
    there is none (:210); rollback_canary clears state (:212-221)."""
    out = _replay(spark, [
        (1, "register", "v1", ""),
        (2, "deploy_active", "vX", ""),   # never registered
        (3, "deploy_active", "v1", ""),
        (4, "rollback_active", None, ""),  # v1 is oldest -> noop
        (5, "register", "v2", ""),
        (6, "deploy_active", "v2", ""),
        (7, "rollback_active", None, ""),  # -> v1
        (8, "rollback_canary", None, ""),  # nothing -> noop
        (9, "register", "v1", ""),         # duplicate -> rejected
    ])
    assert out[2]["status"] == "rejected" and out[2]["active_version"] is None
    assert out[4]["status"] == "noop" and out[4]["active_version"] == "v1"
    assert out[7]["status"] == "applied" and out[7]["active_version"] == "v1"
    assert out[8]["status"] == "noop"
    assert out[9]["status"] == "rejected"


def test_canary_tenant_routing_global_and_scoped(spark):
    """is_canary_tenant (model_manager.py:143-148): no canary -> False;
    EMPTY tenant set -> global canary; else membership. route_requests_final
    hands canary tenants the canary model, the rest the active model."""
    from pyrope_spark.operators.model_ledger import (
        replay_model_lifecycle,
        route_requests_final,
    )

    reqs = spark.createDataFrame(
        [(1, "tA"), (2, "tB"), (3, "tC")], "rid long, tenant_id string"
    )

    def routed(events):
        ev = spark.createDataFrame(
            events, "seq long, action string, version string, tenants string"
        )
        ledger = replay_model_lifecycle(ev)
        return {
            r["rid"]: r for r in route_requests_final(reqs, ledger).collect()
        }

    base = [
        (1, "register", "v1", ""),
        (2, "register", "v2", ""),
        (3, "deploy_active", "v1", ""),
    ]
    # scoped canary: only tA routes to it
    out = routed(base + [(4, "deploy_canary", "v2", "tA")])
    assert out[1]["model_version"] == "v2" and out[1]["is_canary"]
    assert out[2]["model_version"] == "v1" and not out[2]["is_canary"]
    # empty tenant set -> GLOBAL canary
    out = routed(base + [(4, "deploy_canary", "v2", "")])
    assert all(out[i]["model_version"] == "v2" and out[i]["is_canary"]
               for i in (1, 2, 3))
    # no canary -> active for everyone
    out = routed(base)
    assert all(out[i]["model_version"] == "v1" and not out[i]["is_canary"]
               for i in (1, 2, 3))
