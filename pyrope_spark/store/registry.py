"""Index registry: per-(tenant, index) metadata with a monotonic epoch.

Reference: ``Services/VectorIndexRegistry.cs:13-75`` — map "{tenant}:{index}"
-> index state with dimension/metric checks and an epoch counter used for
cache invalidation (``:52-68,131-136``). In the Spark engine the epoch also
serves as the write sequence number for LSM head-resolution (a stand-in for
the Delta table version a production deployment would use).

Identifier validation ports ``Utils/TenantNamespace.cs:8,36-52``.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from dataclasses import asdict, dataclass, field

NAME_RE = re.compile(r"^[A-Za-z0-9_-]+$")

DEFAULT_ALGO = "ivf_flat"  # reference default tail index (VectorCommandSet.cs:600-603)
DEFAULT_METRIC = "l2"


def validate_name(name: str, what: str = "name") -> str:
    if not NAME_RE.match(name or ""):
        raise ValueError(f"invalid {what} {name!r}: must match [A-Za-z0-9_-]+")
    return name


@dataclass
class IndexMeta:
    tenant_id: str
    index_name: str
    dim: int
    metric: str = DEFAULT_METRIC
    algo: str = DEFAULT_ALGO
    params: dict = field(default_factory=dict)
    epoch: int = 0


class IndexRegistry:
    """JSON-file-backed registry (atomic tmp+rename writes, mirroring the
    reference snapshot discipline, ``Vector/DeltaVectorIndex.cs:160-191``)."""

    def __init__(self, path: str):
        self.path = path
        self._meta: dict[str, IndexMeta] = {}
        self._global_seq = 0
        if os.path.exists(path):
            with open(path) as f:
                raw = json.load(f)
            self._global_seq = raw.get("global_seq", 0)
            for key, m in raw.get("indexes", {}).items():
                self._meta[key] = IndexMeta(**m)

    @staticmethod
    def key(tenant_id: str, index_name: str) -> str:
        return f"{tenant_id}:{index_name}"

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        payload = {
            "global_seq": self._global_seq,
            "indexes": {k: asdict(m) for k, m in self._meta.items()},
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, self.path)

    def get(self, tenant_id: str, index_name: str) -> IndexMeta | None:
        return self._meta.get(self.key(tenant_id, index_name))

    def get_or_create(
        self,
        tenant_id: str,
        index_name: str,
        dim: int,
        metric: str = DEFAULT_METRIC,
        algo: str = DEFAULT_ALGO,
        params: dict | None = None,
    ) -> IndexMeta:
        """Implicit creation on first write with dimension/metric enforcement
        afterwards (reference: VectorIndexRegistry.cs:20-33,86-113; dim
        mismatch -> VEC_ERR_DIM, VectorErrorCodes.cs:6)."""
        validate_name(tenant_id, "tenant"), validate_name(index_name, "index")
        k = self.key(tenant_id, index_name)
        m = self._meta.get(k)
        if m is None:
            m = IndexMeta(tenant_id, index_name, dim, metric, algo, params or {})
            self._meta[k] = m
            self._save()
            return m
        if m.dim != dim:
            raise ValueError(f"VEC_ERR_DIM: index {k} has dim {m.dim}, got {dim}")
        return m

    def bump_epoch(self, tenant_id: str, index_name: str) -> int:
        """Every write/delete/build invalidates cached results
        (reference: VectorIndexRegistry.cs:52-68)."""
        m = self._meta[self.key(tenant_id, index_name)]
        self._global_seq += 1
        m.epoch = self._global_seq
        self._save()
        return m.epoch

    def next_seq(self) -> int:
        self._global_seq += 1
        self._save()
        return self._global_seq

    def all(self) -> list[IndexMeta]:
        return list(self._meta.values())
