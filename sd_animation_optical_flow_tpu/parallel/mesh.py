"""Device mesh construction for SPMD scale-out.

The reference is single-process single-GPU (SURVEY §2.7 — its only
"parallelism" is a DataParallel wrapper used for checkpoint key compat,
ofgen.py:67). Here scale-out is native: a (dp, tp) jax.sharding.Mesh over
ICI; frames batch over dp, attention heads/MLP columns shard over tp,
and multi-frame strip attention shards its token axis (ring attention,
parallel/ring_attention.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('dp', 'tp') mesh. Defaults: all devices on dp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard axis 0 (batch/frames) over dp."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicate_tree(tree, mesh: Mesh):
    """Place every leaf replicated over the mesh. Params committed to a
    single device cannot feed a multi-device jit (in-jit sharding
    constraints see conflicting device sets); CLI scale-out paths
    replicate the model bundles through this before the first call."""
    import jax
    return jax.device_put(tree, replicated(mesh))
