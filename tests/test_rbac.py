from __future__ import annotations

from pyrope_spark.operators.rbac import (
    ROLE_PERMISSIONS,
    ROLE_READER,
    ROLE_TENANT_ADMIN,
    rbac_decisions,
)


def _fixtures(spark):
    users = spark.createDataFrame(
        [
            ("u1", "t1", "key-u1", "Reader"),
            ("u2", "t1", "key-u2", "Operator"),
            ("u3", "t2", "key-u3", "TenantAdmin"),
        ],
        "user_id string, tenant_id string, api_key string, role string",
    )
    tenants = spark.createDataFrame(
        [("t1", "legacy-t1"), ("t2", "legacy-t2")],
        "tenant_id string, api_key string",
    )
    return users, tenants


def _run(spark, rows):
    users, tenants = _fixtures(spark)
    req = spark.createDataFrame(
        rows, "rid long, tenant_id string, api_key string, permission string"
    )
    return {
        r["rid"]: r for r in rbac_decisions(req, users, tenants).collect()
    }


def test_rbac_resolution_matrix(spark):
    """Port of the reference resolution rules
    (RbacAuthorizationService.cs:23-87)."""
    out = _run(
        spark,
        [
            (1, "t1", "key-u1", "IndexRead"),      # Reader: allowed
            (2, "t1", "key-u1", "IndexBuild"),     # Reader: not an Operator perm
            (3, "t1", "key-u2", "IndexBuild"),     # Operator: allowed
            (4, "t1", "key-u2", "IndexCreate"),    # Operator: admin-only
            (5, "t2", "key-u3", "IndexCreate"),    # TenantAdmin: allowed
            (6, "t2", "key-u1", "IndexRead"),      # user key, WRONG tenant: no
                                                   # legacy fallback once bound
            (7, "t1", "legacy-t1", "UserManage"),  # legacy key -> TenantAdmin
            (8, "t1", "legacy-t2", "IndexRead"),   # other tenant's legacy key
            (9, "t1", "nope", "IndexRead"),        # unknown key
            (10, "t1", "", "IndexRead"),           # blank key
            (11, "", "key-u1", "IndexRead"),       # blank tenant
            (12, "t1", "key-u2", "NotAPerm"),      # unknown permission
        ],
    )
    assert out[1]["allowed"] and out[1]["role"] == "Reader"
    assert not out[2]["allowed"] and out[2]["role"] == "Reader"
    assert out[3]["allowed"]
    assert not out[4]["allowed"]
    assert out[5]["allowed"] and out[5]["resolved_user_id"] == "u3"
    assert not out[6]["allowed"] and out[6]["role"] is None
    assert out[7]["allowed"] and out[7]["role"] == "TenantAdmin"
    assert out[7]["resolved_user_id"] == "admin"
    assert not out[8]["allowed"] and out[8]["role"] is None
    assert not out[9]["allowed"] and out[9]["role"] is None
    assert not out[10]["allowed"] and out[10]["role"] is None
    assert not out[11]["allowed"] and out[11]["role"] is None
    assert not out[12]["allowed"] and out[12]["role"] == "Operator"


def test_role_hierarchy_is_strictly_increasing():
    reader = ROLE_PERMISSIONS[ROLE_READER]
    admin = ROLE_PERMISSIONS[ROLE_TENANT_ADMIN]
    operator = ROLE_PERMISSIONS["Operator"]
    assert reader < operator < admin  # strict supersets (Role.cs hierarchy)
    assert "SystemManage" not in admin  # Admin-only system perm stays out
