"""Flow evaluation runner over a FlowDataset (EPE / px-accuracy).

The reference vendors RAFT's dataset plumbing but ships no eval runner
(SURVEY §4); this provides one: pad to /8, run the model at eval
iterations, and accumulate masked end-point-error statistics. One jitted
program per input shape (datasets are fixed-resolution, so in practice
one compile per dataset).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import raft as RF
from .flow_data import FlowDataset


@functools.partial(jax.jit, static_argnames=("cfg", "iters"))
def _eval_pair(params, cfg, image1, image2, *, iters):
    _, flow_up = RF.raft_apply(params, cfg, image1, image2, iters=iters)
    return flow_up


def evaluate(params, cfg: RF.RAFTConfig, ds: FlowDataset, *,
             iters: int = 24, max_samples: int | None = None
             ) -> Dict[str, float]:
    """Returns {'epe', '1px', '3px', '5px', 'n'} over the dataset
    (the RAFT evaluate.py contract: final-iteration EPE, valid-masked)."""
    tot = {"epe": 0.0, "1px": 0.0, "3px": 0.0, "5px": 0.0}
    count = 0.0
    n = len(ds) if max_samples is None else min(len(ds), max_samples)
    for i in range(n):
        img1, img2, flow_gt, valid = ds[i]
        p1, (h, w) = RF.pad_to_multiple(jnp.asarray(img1)[None], 8)
        p2, _ = RF.pad_to_multiple(jnp.asarray(img2)[None], 8)
        flow = np.asarray(_eval_pair(params, cfg, p1, p2,
                                     iters=iters))[0, :h, :w]
        epe = np.sqrt(((flow - flow_gt) ** 2).sum(-1))
        m = valid >= 0.5
        k = float(m.sum())
        if k == 0:
            continue
        tot["epe"] += float((epe * m).sum())
        tot["1px"] += float(((epe < 1.0) * m).sum())
        tot["3px"] += float(((epe < 3.0) * m).sum())
        tot["5px"] += float(((epe < 5.0) * m).sum())
        count += k
    out = {k: v / max(count, 1.0) for k, v in tot.items()}
    out["n"] = float(n)
    return out
