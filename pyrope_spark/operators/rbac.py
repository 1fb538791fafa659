"""G8 authn/z: RBAC permission resolution as a batch operator.

Reference semantics (``src/Pyrope.GarnetServer/Security/
RbacAuthorizationService.cs:23-87``, ``Permission.cs``, ``Role.cs``):

- Roles are hierarchical: Reader < Operator < TenantAdmin; each level adds
  permissions to the previous level's set (``RolePermissions`` static map).
- ``GetRole(tenant, key)``: blank tenant/key -> null. A key found in the
  per-user registry binds the request to that user — role if the user's
  tenant matches the requested tenant, else null (NO fallback to the legacy
  path once a user matched the key). Otherwise the tenant's legacy API key
  grants TenantAdmin (back-compat), user_id "admin".
- ``HasPermission`` = role resolved and permission in the role's set.

The serving layer checks one key per request; the batch form resolves a
whole request log at once — the shape an audit job or offline access-review
runs over billions of request records.

Scale shape: both registries (users, tenants) are control-plane tables —
thousands of rows against billions of requests — so both joins broadcast
and the whole operator runs map-side inside the request scan; the
role->permission closure is a literal CASE expression (codegen, no join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROLE_READER = "Reader"
ROLE_OPERATOR = "Operator"
ROLE_TENANT_ADMIN = "TenantAdmin"

# Permission sets (Permission.cs:44-81): each tier extends the previous.
READER_PERMS = ["IndexRead", "TenantRead", "PolicyRead", "BillingRead"]
OPERATOR_PERMS = READER_PERMS + [
    "IndexBuild",
    "IndexSnapshot",
    "IndexLoad",
    "CacheFlush",
    "CacheInvalidate",
    "PolicyUpdate",
    "AuditRead",
]
TENANT_ADMIN_PERMS = OPERATOR_PERMS + [
    "IndexCreate",
    "IndexDelete",
    "TenantCreate",
    "TenantUpdate",
    "UserManage",
]

ROLE_PERMISSIONS = {
    ROLE_READER: frozenset(READER_PERMS),
    ROLE_OPERATOR: frozenset(OPERATOR_PERMS),
    ROLE_TENANT_ADMIN: frozenset(TENANT_ADMIN_PERMS),
}


def has_permission_expr(role_col: F.Column, perm_col: F.Column) -> F.Column:
    """``RolePermissions.HasPermission`` as a literal expression: true iff
    the role's (hierarchical) set contains the permission. Unknown roles and
    unknown permissions are false."""
    expr = F.lit(False)
    for role, perms in ROLE_PERMISSIONS.items():
        expr = F.when(
            role_col == role, perm_col.isin(sorted(perms))
        ).otherwise(expr)
    return expr


def _nonblank(c: F.Column) -> F.Column:
    return c.isNotNull() & (F.trim(c) != "")


def rbac_decisions(
    requests: DataFrame,
    users: DataFrame,
    tenants: DataFrame,
    *,
    tenant_col: str = "tenant_id",
    api_key_col: str = "api_key",
    permission_col: str = "permission",
) -> DataFrame:
    """Resolve (role, user_id, allowed) for every request row.

    ``requests``: any columns + (tenant_id, api_key, permission).
    ``users``: (user_id, tenant_id, api_key, role) — per-user registry.
    ``tenants``: (tenant_id, api_key) — legacy tenant-level keys.

    Resolution order per RbacAuthorizationService.cs:33-59: user-registry
    key match binds (even if its tenant then mismatches -> denied); only
    unmatched keys fall through to the legacy tenant key (TenantAdmin,
    user_id "admin").
    """
    # The reference registry is a dict keyed by api_key, so one user per key
    # is structural there; enforce it here (deterministic winner: lowest
    # user_id) so a duplicate key in the table can't fan a request row out
    # into multiple decision rows.
    uw = Window.partitionBy("api_key").orderBy("user_id")
    u = (
        users.withColumn("_udup", F.row_number().over(uw))
        .filter(F.col("_udup") == 1)
        .select(
            F.col("api_key").alias("_ukey"),
            F.col("tenant_id").alias("_utenant"),
            F.col("user_id").alias("_uid"),
            F.col("role").alias("_urole"),
        )
    )
    t = tenants.select(
        F.col("tenant_id").alias("_ttenant"),
        F.col("api_key").alias("_tkey"),
    )
    req = requests.join(
        F.broadcast(u), on=F.col(api_key_col) == F.col("_ukey"), how="left"
    ).join(
        F.broadcast(t), on=F.col(tenant_col) == F.col("_ttenant"), how="left"
    )
    valid = _nonblank(F.col(tenant_col)) & _nonblank(F.col(api_key_col))
    user_matched = F.col("_ukey").isNotNull()
    user_tenant_ok = F.col("_utenant") == F.col(tenant_col)
    legacy_ok = F.col("_tkey").isNotNull() & (
        F.col("_tkey") == F.col(api_key_col)
    )
    role = (
        F.when(~valid, F.lit(None).cast("string"))
        .when(user_matched, F.when(user_tenant_ok, F.col("_urole")))
        .when(legacy_ok, F.lit(ROLE_TENANT_ADMIN))
    )
    user_id = (
        F.when(~valid, F.lit(None).cast("string"))
        .when(user_matched, F.when(user_tenant_ok, F.col("_uid")))
        .when(legacy_ok, F.lit("admin"))
    )
    out = req.withColumn("role", role).withColumn("resolved_user_id", user_id)
    return out.withColumn(
        "allowed",
        F.col("role").isNotNull()
        & has_permission_expr(F.col("role"), F.col(permission_col)),
    ).drop("_ukey", "_utenant", "_uid", "_urole", "_ttenant", "_tkey")


def rbac_case_sql(role_expr: str, perm_expr: str) -> str:
    """DuckDB rendering of :func:`has_permission_expr` (kept in lockstep)."""
    def inlist(perms):
        return ", ".join(f"'{p}'" for p in sorted(perms))

    return (
        f"CASE {role_expr} "
        f"WHEN '{ROLE_READER}' THEN {perm_expr} IN ({inlist(READER_PERMS)}) "
        f"WHEN '{ROLE_OPERATOR}' THEN {perm_expr} IN ({inlist(OPERATOR_PERMS)}) "
        f"WHEN '{ROLE_TENANT_ADMIN}' THEN {perm_expr} IN ({inlist(TENANT_ADMIN_PERMS)}) "
        f"ELSE FALSE END"
    )
