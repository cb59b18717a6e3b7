"""Parameter/activation sharding rules (GSPMD via named shardings).

Tensor-parallel layout for the UNet's transformers (the MXU-heavy part):
q/k/v and GEGLU up-projections are column-sharded over 'tp' (heads /
MLP columns split across chips), output projections row-sharded so XLA
inserts the reduce over ICI. Convs/norms stay replicated — SD-1.5 fits
per-chip; TP here is for latency scaling and for models that don't.

Everything composes with dp batch sharding: jit + these shardings is
the whole distribution story (no hand-written collectives on this path).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_KEYS = ("to_q", "to_k", "to_v", "ff_proj")   # weight [in, out]: split out
ROW_KEYS = ("to_out", "ff_out")                  # weight [in, out]: split in


def _path_names(path) -> list:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
    return names


def unet_param_specs(params) -> Any:
    """PartitionSpec pytree for UNet params (same structure)."""
    def spec(path, leaf):
        names = _path_names(path)
        if leaf.ndim == 2:
            for i, n in enumerate(names):
                if n in COL_KEYS and names[-1] == "w":
                    return P(None, "tp")
                if n in ROW_KEYS and names[-1] == "w":
                    return P("tp", None)
        if leaf.ndim == 1 and names[-1] == "b":
            if any(n in COL_KEYS for n in names):
                return P("tp")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def unet_param_sharding(params, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        unet_param_specs(params))


def shard_params(params, mesh: Mesh):
    shardings = unet_param_sharding(params, mesh)
    return jax.device_put(params, shardings), shardings
