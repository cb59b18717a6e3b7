"""Hierarchical keyframe pipeline (the reference's third orchestrator).

Rebuild of ofgen_keyframe_inpaint.py (reference: lines 372-1267):

  * ``VideoWorkspace`` — resumable on-disk workspace: extracted
    raw-frames/, generated ai-frames/, per-frame self-attention K/V
    store, seed frames (VideoData, :372-483).
  * ``FrameIndices`` — sorted index sets with sliding ``conv_indices``
    windows and nearest-reference ``adjacent_frames`` (:485-542).
  * ``FlowCache`` — batched pairwise flow+confidence with an .npy disk
    cache and purge() (PDCNetAux, :549-653), backed by the in-repo
    FlowConfidenceEstimator.calc_batch.
  * ``keyframe_conv`` — per window keep the frame with the largest total
    pairwise confidence (KeyframeConv, :655-674).
  * Four generation modes (:722-1086): greedy multi-reference warp-merge
    + inpaint, wide-strip joint self-attention, both, and
    warp+inpaint with cross-frame K/V injection (the canonical mode).
  * Seed frames rendered as one wide strip img2img (:1088-1117).
  * The level-pyramid main loop: shrink with keyframe_conv until
    <= n_seed frames, seed, then back-fill each level using nearest
    generated frames as references, carrying reference K/V (:1122-1241).

The K/V flow the reference left half-wired (capture dropped at
ddpm.py:934-935) is complete here: facades capture kv_hist, the store
persists it (compressed fp16 npz instead of CPU pickles), and injection
concatenates all references' K/V per layer.
"""

from __future__ import annotations

import functools
import glob
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.controlnet import ControlSpec, canny_hint, hed_hint
from ..models.unet import SeqParallelConfig, StripConfig
from ..ops.filters import dilate, ellipse_kernel
from ..ops.warp import warp_frame
from ..utils.images import bgr_u8_to_model, model_to_bgr_u8, write_png
from . import facades as F
from .keyframes import EdgeDetector, mean_pixel_distance
from .tagger import NEGATIVE_PROMPT, Tagger


# ---------------------------------------------------------------------------
# workspace
# ---------------------------------------------------------------------------

class VideoWorkspace:
    """Resumable on-disk workspace (VideoData parity)."""

    def __init__(self, workspace_dir: str, frames: Optional[np.ndarray] = None,
                 video_path: Optional[str] = None,
                 size: Tuple[int, int] = (512, 768), keep_every: int = 3,
                 max_len_sec: int = -1, fps: float = 30.0):
        self.workspace_dir = workspace_dir
        self.size = size
        for sub in ("raw-frames", "ai-frames", "flow", "crossattn", "seed"):
            os.makedirs(os.path.join(workspace_dir, sub), exist_ok=True)
        self.fps = fps / keep_every

        existing = sorted(glob.glob(
            os.path.join(workspace_dir, "raw-frames", "*.png")))
        if existing and frames is None and video_path is None:
            self.num_frames = len(existing)
            return

        import cv2
        if video_path is not None:
            video = cv2.VideoCapture(video_path)
            self.fps = (video.get(cv2.CAP_PROP_FPS) or 30.0) / keep_every
            target = 1e18 if max_len_sec == -1 else self.fps * max_len_sec
            ctr, valid = -1, -1
            while True:
                ctr += 1
                ret, frame = video.read()
                if not ret:
                    break
                if ctr % keep_every != 0:
                    continue
                valid += 1
                dst = os.path.join(workspace_dir, "raw-frames",
                                   f"{valid:05d}.png")
                if not os.path.exists(dst):
                    frame = cv2.resize(frame, size,
                                       interpolation=cv2.INTER_AREA)
                    cv2.imwrite(dst, frame)
                if valid >= target:
                    break
            video.release()
            self.num_frames = valid + 1
        else:
            assert frames is not None
            kept = frames[::keep_every]
            for i, frame in enumerate(kept):
                if tuple(frame.shape[1::-1]) != size:
                    frame = cv2.resize(frame, size,
                                       interpolation=cv2.INTER_AREA)
                cv2.imwrite(os.path.join(workspace_dir, "raw-frames",
                                         f"{i:05d}.png"), frame)
            self.num_frames = len(kept)

    @property
    def size_hw(self):
        return (self.size[1], self.size[0])

    def _raw(self, n):
        return os.path.join(self.workspace_dir, "raw-frames", f"{n:05d}.png")

    def _ai(self, n):
        return os.path.join(self.workspace_dir, "ai-frames", f"{n:05d}.png")

    @property
    def _frame_pipe(self):
        """Native decoded-frame cache (native/frameloader.cpp): raw uint8
        blobs with an async prefetching reader + write-behind writer, so
        repeated raw-frame reads (keyframe scan, flow pairs, per-level
        back-fill) skip PNG decode and ride readahead. PNGs stay the
        resumable on-disk contract; blobs back-fill lazily on miss."""
        if not hasattr(self, "_pipe"):
            from ..native.framepipe import FramePipe
            self._pipe = FramePipe(
                os.path.join(self.workspace_dir, "raw-cache"),
                self.num_frames, self.size_hw + (3,))
        return self._pipe

    def get_raw_frame(self, n):
        import cv2
        assert n < self.num_frames
        pipe = self._frame_pipe
        try:
            return pipe.get(n)
        except FileNotFoundError:
            frame = cv2.imread(self._raw(n))
            if frame is not None and frame.shape == pipe.shape:
                pipe.put(n, frame)
            return frame

    def get_ai_frame(self, n):
        import cv2
        return cv2.imread(self._ai(n)) if os.path.exists(self._ai(n)) else None

    def generated(self, n) -> bool:
        return os.path.exists(self._ai(n))

    def put_ai_frame(self, n, frame):
        import cv2
        cv2.imwrite(self._ai(n), frame)

    # K/V store: fp16 compressed npz of the 16-layer (k, v) pytree
    def _kv(self, n):
        return os.path.join(self.workspace_dir, "crossattn", f"{n:05d}.npz")

    def put_kv(self, n, kv_hist):
        # one batched device_get for the whole 16-layer tree (a per-array
        # pull pays the link RTT 32x), f16 on disk
        import jax
        host = jax.device_get(tuple(kv_hist))
        arrays = {}
        for i, (k, v) in enumerate(host):
            arrays[f"k{i}"] = np.asarray(k).astype(np.float16)
            arrays[f"v{i}"] = np.asarray(v).astype(np.float16)
        np.savez(self._kv(n), **arrays)

    def get_kv(self, n):
        if not os.path.exists(self._kv(n)):
            return None
        data = np.load(self._kv(n))
        layers = len(data.files) // 2
        # bf16 on device: the UNet attends in bf16 anyway, and f32 ref
        # K/V doubled the injected-KV HBM footprint (the 4-frame batched
        # back-fill program OOM'd at 24.75G/15.75G on v5e with f32 KV)
        return tuple((jnp.asarray(data[f"k{i}"], jnp.bfloat16),
                      jnp.asarray(data[f"v{i}"], jnp.bfloat16))
                     for i in range(layers))

    def remove_kv(self, n):
        if os.path.exists(self._kv(n)):
            os.remove(self._kv(n))

    def key_frames(self, th: float = 48.0, max_gap: int = 300):
        """Level-0 keyframe scan over extracted frames (VideoData.key_frames)."""
        detector = EdgeDetector()
        key_edges = None
        gap = 0
        for i in range(self.num_frames):
            gap += 1
            frame = self.get_raw_frame(i)
            if key_edges is None:
                key_edges = detector(frame)
                yield frame, i
                continue
            edges = detector(frame)
            if th * (max_gap - gap) / max_gap < mean_pixel_distance(
                    edges, key_edges):
                key_edges = edges
                gap = 0
                yield frame, i


# ---------------------------------------------------------------------------
# frame index sets
# ---------------------------------------------------------------------------

class FrameIndices:
    """Sorted frame index set (VideoFrameIndices parity)."""

    def __init__(self, indices=()):
        self.indices: List[int] = sorted(set(int(i) for i in indices))

    @staticmethod
    def from_n(n: int) -> "FrameIndices":
        return FrameIndices(range(n))

    def conv_indices(self, kernel_size: int = 17, stride: int = 8,
                     dilation: int = 1):
        idx = 0
        while idx < len(self.indices):
            yield FrameIndices(self.indices[idx: idx + kernel_size][::dilation])
            idx += stride

    def remove(self, other: "FrameIndices"):
        self.indices = sorted(set(self.indices) - set(other.indices))

    def add(self, other):
        extra = {other} if isinstance(other, int) else set(other.indices)
        self.indices = sorted(set(self.indices) | extra)

    def adjacent_frames(self, idx: int, n: int) -> "FrameIndices":
        """The n-window of indices with minimal total distance to idx."""
        if len(self) <= n:
            return self
        best, best_dist = None, None
        for i in range(0, len(self) - n):
            cand = self.indices[i: i + n]
            dist = int(np.sum(np.abs(np.asarray(cand) - idx)))
            if best_dist is None or dist < best_dist:
                best, best_dist = cand, dist
        return FrameIndices(best)

    def __len__(self):
        return len(self.indices)

    def __iter__(self):
        return iter(self.indices)


# ---------------------------------------------------------------------------
# flow cache
# ---------------------------------------------------------------------------

class FlowCache:
    """Batched pairwise flow+confidence with .npy cache (PDCNetAux parity).
    Entry layout per (s, t): [H, W, 3] = (flow_x, flow_y, confidence) in the
    target frame t's coordinates."""

    def __init__(self, estimator, workspace_dir: str, batch_size: int = 8):
        self.estimator = estimator
        self.batch_size = batch_size
        self.pair_dir = os.path.join(workspace_dir, "flow")
        os.makedirs(self.pair_dir, exist_ok=True)
        self.cached_pair = set()
        for f in glob.glob(os.path.join(self.pair_dir, "*.npy")):
            s, t = os.path.basename(f).split(".")[0].split("-")
            self.cached_pair.add((int(s), int(t)))

    def purge(self):
        self.cached_pair = set()
        for f in glob.glob(os.path.join(self.pair_dir, "*.npy")):
            os.remove(f)

    def _path(self, s, t):
        return os.path.join(self.pair_dir, f"{s:05d}-{t:05d}.npy")

    def _load(self, s, t):
        # f16 on disk (and on the wire) -> f32 for host math
        return np.load(self._path(s, t)).astype(np.float32)

    def _compute_pairs(self, video: VideoWorkspace, pairs,
                       store_reverse: bool = True):
        # The estimator's fb-confidence already runs RAFT in BOTH
        # directions per pair, so one program yields (s, t) AND (t, s)
        # (calc_batch_bidir_f16) — dedupe to unordered pairs and store
        # both entries: the pairwise phase (calculate_pairwise asks for
        # every directed pair) does half the RAFT work for the same
        # fields (bit-identical at equal batch size; across batch sizes
        # XLA retiles and the low f16 bits can differ).
        # store_reverse=False (the multiple-to-one back-fill phase, which
        # only ever reads (s, target)) skips the reverse download+write:
        # the backward RAFT pass still runs on device (fb-confidence
        # needs it) but its fields don't cross the host link.
        bidir = store_reverse and hasattr(self.estimator,
                                          "calc_batch_bidir_f16")
        if bidir:
            seen, canon = set(), []
            for s, t in pairs:
                key = (min(s, t), max(s, t))
                if key in seen:
                    continue
                seen.add(key)
                canon.append((s, t))
            pairs = canon
        start = 0
        while start < len(pairs):
            batch = pairs[start: start + self.batch_size]
            src = np.stack([video.get_raw_frame(s)[..., ::-1] for s, _ in batch])
            tgt = np.stack([video.get_raw_frame(t)[..., ::-1] for _, t in batch])
            # uint8 stacks upload 4x lighter; the estimator casts on
            # device. Downloads ride as f16 (calc_batch_f16): half the
            # bytes across the O(N^2) pairwise phase.
            try:
                if bidir:
                    flow, conf, rflow, rconf = \
                        self.estimator.calc_batch_bidir_f16(src, tgt)
                elif hasattr(self.estimator, "calc_batch_f16"):
                    flow, conf = self.estimator.calc_batch_f16(src, tgt)
                else:
                    flow, conf, _ = self.estimator.calc_batch(src, tgt)
            except Exception:
                # batched RAFT is HBM-hungry (the all-pairs correlation
                # volume is ~0.4GB/pair at 512x768, and one program runs
                # fwd+bwd = 2B images): on compile OOM halve the batch
                # and retry — 8 pairs fit one v5e, 12 do not
                if len(batch) == 1:
                    raise
                self.batch_size = max(1, len(batch) // 2)
                # settle the backend before retrying: a failed async
                # execution can hold HBM until its buffers are dropped
                import gc
                gc.collect()
                try:
                    import jax
                    jax.block_until_ready(jnp.zeros(()))
                except Exception:
                    pass
                continue
            start += len(batch)
            for i, (s, t) in enumerate(batch):
                entry = np.concatenate(
                    [flow[i], conf[i][..., None]],
                    axis=-1, dtype=np.float16)
                np.save(self._path(s, t), entry)
                self.cached_pair.add((s, t))
                if bidir:
                    rentry = np.concatenate(
                        [rflow[i], rconf[i][..., None]],
                        axis=-1, dtype=np.float16)
                    np.save(self._path(t, s), rentry)
                    self.cached_pair.add((t, s))

    def calculate_single(self, video, s, t) -> np.ndarray:
        if s == t:
            e = np.zeros((*video.size_hw, 3), np.float32)
            e[..., 2] = 1.0
            return e
        if (s, t) not in self.cached_pair:
            self._compute_pairs(video, [(s, t)])
        return self._load(s, t)

    def calculate_multiple_to_one(self, video, source_indices: FrameIndices,
                                  target_index: int) -> np.ndarray:
        """-> [N_source, 1, H, W, 3]."""
        todo = [(s, target_index) for s in source_indices
                if s != target_index and (s, target_index) not in
                self.cached_pair]
        if todo:
            self._compute_pairs(video, todo, store_reverse=False)
        n = len(source_indices)
        ret = np.zeros((n, 1, *video.size_hw, 3), np.float32)
        for i, s in enumerate(source_indices):
            ret[i, 0] = self.calculate_single(video, s, target_index)
        return ret

    def calculate_pairwise(self, video, indices: FrameIndices) -> np.ndarray:
        """-> [N, N, H, W, 3]."""
        todo = [(s, t) for s in indices for t in indices
                if s != t and (s, t) not in self.cached_pair]
        if todo:
            self._compute_pairs(video, todo)
        n = len(indices)
        ret = np.zeros((n, n, *video.size_hw, 3), np.float32)
        for i, s in enumerate(indices):
            for j, t in enumerate(indices):
                ret[i, j] = self.calculate_single(video, s, t)
        return ret


def keyframe_conv(flow_cache: FlowCache, workspace: str,
                  video: VideoWorkspace, frames: FrameIndices,
                  kernel_size: int = 17, stride: int = 8,
                  dilation: int = 2) -> FrameIndices:
    """Per sliding window keep the best-connected frame: argmax over
    sources of total pairwise confidence (KeyframeConv, :655-674).
    Resumable via the per-level workspace directory."""
    if os.path.exists(workspace):
        files = glob.glob(os.path.join(workspace, "*.png"))
        if files:
            return FrameIndices(int(os.path.basename(f).split(".")[0])
                                for f in files)
    os.makedirs(workspace, exist_ok=True)
    ret = set()
    for local in frames.conv_indices(kernel_size, stride, dilation):
        mat = flow_cache.calculate_pairwise(video, local)
        totals = mat[..., 2].sum(axis=(1, 2, 3))   # [N_source]
        ret.add(local.indices[int(np.argmax(totals))])
    for idx in ret:
        write_png(os.path.join(workspace, f"{idx:05d}.png"),
                  video.get_raw_frame(idx))
    return FrameIndices(ret)


# ---------------------------------------------------------------------------
# generation helpers
# ---------------------------------------------------------------------------

def expand_mask(mask_u8: np.ndarray, ori_image: np.ndarray) -> np.ndarray:
    """Widen the inpaint mask along strong edges: |Laplacian| > 20,
    dilated ellipse-7, OR'd in (:968-973)."""
    import cv2
    lap = np.absolute(cv2.Laplacian(ori_image, cv2.CV_64F)).astype(np.uint8)
    lap = (cv2.cvtColor(lap, cv2.COLOR_BGR2GRAY) > 20).astype(np.uint8) * 255
    lap = cv2.dilate(lap, ellipse_kernel(7).astype(np.uint8))
    return np.bitwise_or(mask_u8, lap)


def greedy_warp_merge(video: VideoWorkspace, reference_frames: FrameIndices,
                      flow_mat: np.ndarray, thres: float = 0.5):
    """Greedy multi-reference warp-merge (:999-1024): repeatedly pick the
    reference with the largest remaining confidence mass, warp its AI
    frame, paste its confident pixels, subtract the covered region.

    Returns (merged_frame_bgr, covered_mask_u8 [255 = confident/warped]).
    """
    fm = flow_mat.copy()
    fm[..., 2] = (fm[..., 2] > thres).astype(np.float32)
    h, w = fm.shape[2:4]
    mask = np.zeros((h, w), np.uint8)
    merged = None
    for _ in range(len(reference_frames)):
        totals = fm[..., 2].sum(axis=(1, 2, 3))
        rel = int(np.argmax(totals))
        ref_idx = reference_frames.indices[rel]
        ai = video.get_ai_frame(ref_idx)
        assert ai is not None, f"reference {ref_idx} not generated yet"
        warped = np.asarray(warp_frame(jnp.asarray(ai.astype(np.float32)),
                                       jnp.asarray(fm[rel, 0, :, :, :2])))
        warped = np.clip(warped, 0, 255).astype(np.uint8)
        conf = fm[rel, 0, :, :, 2]
        cur_mask = (conf * 255).astype(np.uint8)
        mask = np.bitwise_or(mask, cur_mask)
        if merged is None:
            merged = warped.copy()
        else:
            m = (cur_mask / 255).astype(np.uint8)[:, :, None]
            merged = (merged * (1 - m) + warped * m).astype(np.uint8)
        fm[:, 0, :, :, 2] = np.clip(fm[:, 0, :, :, 2] - conf[None], 0, 1)
    return merged, mask


@functools.partial(jax.jit, static_argnames=("cfg", "thres", "expand"))
def _fused_prep_impl(params, head_params, cfg, src_bgr, tgt_bgr, ai_bgr,
                     *, thres: float, expand: str):
    """ONE compiled program for the per-frame back-fill prep: RAFT
    flow+confidence for all references, cubic warp of their AI frames,
    the greedy confidence-mass merge, and the inpaint-mask morphology.

    The reference runs these as separate stages with host round-trips
    between them (ofgen_keyframe_inpaint.py:1174-1240: PDCNet batch ->
    numpy greedy merge over cv2.remap warps -> cv2 dilate); round-3
    profiling showed the back-fill phase is dominated by per-program
    dispatch/executable-load overhead, not chip time — so the whole prep
    is one XLA program here (the inpaint facade is the only other
    program per frame).

    src_bgr [N,H,W,3] u8 raw reference frames, tgt_bgr [H,W,3] u8 raw
    target frame, ai_bgr [N,H,W,3] u8 generated reference frames.
    ``expand``: "dilate" applies the ellipse-7 mask dilation in-program
    (warp_and_inpaint mode); "none" returns the raw uncovered mask (the
    crossattn mode's Laplacian edge-expansion is cv2-exact on host).

    Returns (merged_bgr u8 [H,W,3], covered u8 [H,W],
             mask2 u8 [H,W], img_model f32 [H,W,3] RGB[-1,1],
             ref_model f32 [H,W,3]) — merged/covered bit-match
    greedy_warp_merge fed the same flow fields (binary-mask arithmetic
    throughout; duplicated padded references are no-ops: their
    confidence mass is subtracted by the first pick).
    """
    from ..models.flowconf import _flow_conf_batch
    from ..models.raft import pad_to_multiple

    n = src_bgr.shape[0]
    src = src_bgr[..., ::-1].astype(jnp.float32)
    tgt = jnp.broadcast_to(tgt_bgr[None, ..., ::-1].astype(jnp.float32),
                           src.shape)
    src_p, (h, w) = pad_to_multiple(src, 8)
    tgt_p, _ = pad_to_multiple(tgt, 8)
    flow, conf, _ = _flow_conf_batch(params, cfg, src_p, tgt_p,
                                     head_params=head_params)
    flow = flow[:, :h, :w]
    conf = conf[:, :h, :w]

    return _warp_merge_morph(flow, conf, ai_bgr, tgt_bgr, thres=thres,
                             expand=expand)


@functools.partial(jax.jit, static_argnames=("thres", "expand"))
def _warp_merge_morph(flow, conf, ai_bgr, tgt_bgr, *, thres: float,
                      expand: str):
    """Warp + greedy merge + morphology half of the fused prep (split
    out so tests can drive it with externally-computed flow fields; the
    production path traces it inside _fused_prep_impl — still one
    program)."""
    n = ai_bgr.shape[0]
    h, w = flow.shape[1:3]
    # cubic warp of each reference's AI frame into target coordinates,
    # then the reference's clip+truncate-to-u8 (greedy_warp_merge)
    warped = jax.vmap(lambda a, f: warp_frame(a, f))(
        ai_bgr.astype(jnp.float32), flow)
    warped_u8 = jnp.clip(warped, 0, 255).astype(jnp.uint8)
    fmc = (conf > thres).astype(jnp.float32)        # binary mass field

    def body(k, carry):
        merged, mask, fmc = carry
        rel = jnp.argmax(fmc.sum(axis=(1, 2)))
        confk = fmc[rel]                            # [H,W] in {0,1}
        cur = confk > 0.5
        wk = warped_u8[rel]
        # first pick pastes wholesale (merged starts as its warp);
        # later picks paste only their confident pixels
        merged = jnp.where((k == 0) | cur[..., None], wk, merged)
        mask = mask | cur
        fmc = jnp.clip(fmc - confk[None], 0.0, 1.0)
        return merged, mask, fmc

    merged, mask, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros_like(warped_u8[0]),
                     jnp.zeros((h, w), bool), fmc))
    covered = jnp.where(mask, jnp.uint8(255), jnp.uint8(0))
    mask2 = jnp.where(mask, jnp.uint8(0), jnp.uint8(255))
    if expand == "dilate":
        mask2 = dilate(mask2, ellipse_kernel(7)).astype(jnp.uint8)
    img_model = merged[..., ::-1].astype(jnp.float32) / 127.5 - 1.0
    ref_model = tgt_bgr[..., ::-1].astype(jnp.float32) / 127.5 - 1.0
    return merged, covered, mask2, img_model, ref_model


def fused_flow_warp_merge(est, video: VideoWorkspace,
                          ref_idxs: Sequence[int], idx: int, *,
                          thres: float, expand: str, n_pad: int = 0):
    """Host wrapper for _fused_prep_impl: stacks the (padded) reference
    frames as uint8 uploads and runs the one-program prep.

    ``n_pad``: pad the reference set to this count by repeating the last
    reference so every frame of a level reuses ONE compiled program
    (padded duplicates cannot perturb the merge — see _fused_prep_impl).
    """
    idxs = list(ref_idxs)
    if n_pad > len(idxs):
        idxs = idxs + [idxs[-1]] * (n_pad - len(idxs))
    src = np.stack([video.get_raw_frame(s) for s in idxs])
    ais = []
    for s in idxs:
        ai = video.get_ai_frame(s)
        assert ai is not None, f"reference {s} not generated yet"
        ais.append(ai)
    return _fused_prep_impl(
        est.params, est.head_params, est.cfg,
        jnp.asarray(src), jnp.asarray(video.get_raw_frame(idx)),
        jnp.asarray(np.stack(ais)), thres=float(thres), expand=expand)


def _default_controls(control_bundle, condition_bgr, latent_batch=2):
    """hed 0.7 (full window) + canny 0.3 (0..0.9) on the original frame
    (:1028-1048). control_bundle: None or (params, cfg, hed_fn)."""
    if control_bundle is None:
        return ()
    params, cfg, hed_fn = control_bundle
    return (
        ControlSpec(params, cfg, hed_hint(condition_bgr, hed_fn,
                                          batch=latent_batch),
                    weight=0.7, guidance_start=0.0, guidance_end=1.0),
        ControlSpec(params, cfg, canny_hint(condition_bgr, 100, 200,
                                            batch=latent_batch),
                    weight=0.3, guidance_start=0.0, guidance_end=0.9),
    )


def concat_ref_kv(kv_hists: Sequence) -> Optional[tuple]:
    """Concatenate several stored K/V pytrees along the token axis, per
    layer (the reference concatenates k/v across ref images,
    attention.py:360-361)."""
    kv_hists = [kv for kv in kv_hists if kv is not None]
    if not kv_hists:
        return None
    layers = len(kv_hists[0])
    out = []
    for i in range(layers):
        ks = jnp.concatenate([kv[i][0] for kv in kv_hists], axis=1)
        vs = jnp.concatenate([kv[i][1] for kv in kv_hists], axis=1)
        out.append((ks, vs))
    return tuple(out)


# ---------------------------------------------------------------------------
# pipeline config + modes
# ---------------------------------------------------------------------------

@dataclass
class KeyframeInpaintConfig:
    size: Tuple[int, int] = (512, 768)
    keep_every: int = 3
    max_len_sec: int = 30
    kernel_size: int = 30
    stride: int = 15
    dilation: int = 2
    n_seed_frames: int = 1
    num_ref_for_generation: int = 1
    denoising_strength: float = 0.8
    conf_thres: float = 0.95        # dispatcher default (:1071)
    mode_thres: float = 0.5         # per-mode default (:737)
    ddim_steps: int = 50
    mask_blur: int = 4
    seed: int = 1234
    prompt_extra: str = ""
    mode: str = "warp_and_inpaint_crossattn"
    # pairs per compiled flow program. The reference batches 16
    # (ofgen_keyframe_inpaint.py:1128); on one v5e the batched fwd+bwd
    # RAFT costs ~1.6G HBM/pair f32 / ~0.8G bf16-corr and shares the
    # chip with ~4G of resident SD params. With the bf16 corr pyramid
    # (the CLI default) 8 is the largest reliably-fitting chunk and
    # runs 539 vs 716 ms/pair bidir; f32 caps at 4-6 (FlowCache
    # additionally halves adaptively on compile OOM)
    flow_batch: int = 8
    use_reference_kv: bool = True
    # fold flow + warp + greedy merge + mask morphology into ONE compiled
    # program per frame for the warp_and_inpaint modes (the back-fill's
    # marginal cost is per-program overhead — DECISIONS round 3). False
    # restores the staged host path (flow cache -> numpy merge).
    fused_prep: bool = True
    # >1: back-fill each level in chunks of this many frames per
    # compiled program (frames of a level are independent given the
    # previous level). Level-0 K/V chaining then runs per CHUNK: the
    # previous chunk's last frame K/V is injected into every frame of
    # the next chunk (serial mode chains frame-to-frame). 1 = the
    # reference-faithful serial loop.
    level_batch: int = 1
    # sequence parallelism for the strip modes: shard the strip's row
    # axis over a mesh (SeqParallelConfig) — None keeps single-device
    # dense attention
    sp: Optional[SeqParallelConfig] = None
    guidance_schedule_func = staticmethod(lambda p: 1.0)


def _prompt(tagger, frame_bgr, extra):
    if tagger is not None and tagger.available:
        return tagger.build_prompt(frame_bgr, extra)
    return "masterpiece,best quality," + extra if extra else \
        "masterpiece,best quality"


def generate_with_refs(sd_inpaint, tagger, video: VideoWorkspace,
                       frame_idx: int, reference_frames: FrameIndices,
                       flow_cache: FlowCache, cfg: KeyframeInpaintConfig,
                       control_bundle=None, reference_kv=None,
                       level: int = 0, workspace: str = ""):
    """Dispatch over the four generation modes (:1063-1086).
    Returns (frame_bgr, kv_hist)."""
    original = video.get_raw_frame(frame_idx)
    prompt = _prompt(tagger, original, cfg.prompt_extra)
    mode = cfg.mode

    if mode in ("warp_and_inpaint", "warp_and_inpaint_crossattn"):
        crossattn = mode == "warp_and_inpaint_crossattn"
        if cfg.fused_prep:
            merged_d, covered_d, mask2_d, _, _ = fused_flow_warp_merge(
                flow_cache.estimator, video, reference_frames, frame_idx,
                thres=cfg.mode_thres,
                expand="none" if crossattn else "dilate",
                n_pad=cfg.num_ref_for_generation)
            merged = np.asarray(merged_d)
            mask2 = (expand_mask(255 - np.asarray(covered_d), original)
                     if crossattn else np.asarray(mask2_d))
        else:
            flow_mat = flow_cache.calculate_multiple_to_one(
                video, reference_frames, frame_idx)
            merged, covered = greedy_warp_merge(video, reference_frames,
                                                flow_mat, cfg.mode_thres)
            mask2 = 255 - covered              # inpaint the UNcovered
            if crossattn:
                mask2 = expand_mask(mask2, original)
            else:
                mask2 = np.asarray(dilate(jnp.asarray(mask2),
                                          ellipse_kernel(7))).astype(np.uint8)
        ref_kv = concat_ref_kv(reference_kv) \
            if (reference_kv and mode.endswith("crossattn")) else None
        # K/V capture (an extra UNet pass + a ~70MB store per frame) only
        # pays off when a later frame will inject it — i.e. the
        # crossattn modes with use_reference_kv on
        want_kv = cfg.use_reference_kv and mode.endswith("crossattn")
        out, _, _, kv = F.img2img_inpaint(
            sd_inpaint,
            image=bgr_u8_to_model(merged),
            c_text=prompt, uc_text=NEGATIVE_PROMPT,
            denoising_strength=cfg.denoising_strength,
            ddim_steps=cfg.ddim_steps,
            reference_img=bgr_u8_to_model(original),
            mask=mask2.astype(np.float32) / 255.0,
            mask_blur=cfg.mask_blur,
            guidance_schedule_func=cfg.guidance_schedule_func,
            seed=cfg.seed, reference_kv=ref_kv, capture_kv=want_kv,
            control_specs=_default_controls(control_bundle, original))
        frame = model_to_bgr_u8(out)
        if workspace:
            vis_dir = os.path.join(workspace, "render_vis", f"u{level:02d}")
            vis = np.concatenate([original, merged, frame], axis=1)
            write_png(os.path.join(vis_dir, f"{frame_idx:05d}.png"), vis)
        return frame, kv

    if mode in ("self_attn", "both"):
        # width-concatenated strip: [target | references]; only the first
        # tile is denoised/inpainted (:810-860, 860-966)
        h, w = video.size_hw
        n_ref = len(reference_frames)
        if mode == "self_attn":
            first_tile = original
            strip_mask_covered = np.zeros((h, w), np.uint8)
        elif cfg.fused_prep:
            first_tile_d, covered_d, _, _, _ = fused_flow_warp_merge(
                flow_cache.estimator, video, reference_frames, frame_idx,
                thres=cfg.mode_thres, expand="none",
                n_pad=cfg.num_ref_for_generation)
            first_tile = np.asarray(first_tile_d)
            strip_mask_covered = np.asarray(covered_d)
        else:
            flow_mat = flow_cache.calculate_multiple_to_one(
                video, reference_frames, frame_idx)
            first_tile, covered = greedy_warp_merge(
                video, reference_frames, flow_mat, cfg.mode_thres)
            strip_mask_covered = covered
        strip = np.zeros((h, w * (n_ref + 1), 3), np.uint8)
        strip[:, :w] = first_tile
        for i, idx in enumerate(reference_frames):
            ai = video.get_ai_frame(idx)
            assert ai is not None
            strip[:, (i + 1) * w: (i + 2) * w] = ai
        mask = np.zeros((h, w * (n_ref + 1)), np.uint8)
        mask[:, :w] = 255 - strip_mask_covered if mode == "both" else 255
        out, _, _, kv = F.img2img_inpaint(
            sd_inpaint,
            image=bgr_u8_to_model(strip),
            c_text=prompt, uc_text=NEGATIVE_PROMPT,
            denoising_strength=cfg.denoising_strength,
            ddim_steps=cfg.ddim_steps,
            reference_img=bgr_u8_to_model(strip),   # identity composite
            mask=mask.astype(np.float32) / 255.0,
            mask_blur=cfg.mask_blur,
            guidance_schedule_func=cfg.guidance_schedule_func,
            seed=cfg.seed, capture_kv=cfg.use_reference_kv,
            control_specs=_default_controls(control_bundle, strip),
            # forward_mfr band bias (attention.py:243-310): the target
            # tile is attracted to spatially-corresponding reference
            # pixels at every self-attention layer
            strip=StripConfig(n_tiles=n_ref + 1, mode="target"),
            sp=cfg.sp)
        frame = model_to_bgr_u8(out)[:, :w]
        return frame, kv

    raise ValueError(f"unknown generation mode {mode!r}")


def _backfill_level_batched(sd_inpaint, tagger, video: VideoWorkspace,
                            cur: FrameIndices, generated: FrameIndices,
                            flow_cache: FlowCache,
                            cfg: KeyframeInpaintConfig, level: int,
                            workspace: str):
    """Back-fill one level in chunks of ``cfg.level_batch`` frames per
    compiled program.

    The reference generates the level serially
    (ofgen_keyframe_inpaint.py:1174-1240), but every frame of a level
    depends only on the PREVIOUS level's generated frames — the loop is
    embarrassingly parallel, and batching the independent frames
    multiplies MXU utilization of the shared denoise scan. Each frame
    still injects its own references' K/V (per-frame reference_kv batch).
    Level-0 chaining approximation: serial mode appends the immediately
    preceding frame's K/V; here the previous chunk's last frame K/V is
    appended for every frame of the chunk.
    """
    crossattn = cfg.mode.endswith("crossattn")
    want_kv = cfg.use_reference_kv and crossattn
    vis_dir = os.path.join(workspace, "render_vis", f"u{level:02d}")
    os.makedirs(vis_dir, exist_ok=True)
    idxs = list(cur.indices)
    prev_chunk_last = -1
    eff_batch = cfg.level_batch
    if want_kv:
        # per-frame injected ref K/V makes the batched program HBM-heavy:
        # a 4-frame 512x768 chunk compiled to 24.75G vs 15.75G available
        # on one v5e. Cap the chunk so that KV-injecting chunks stay
        # ~2 frames at 512x768, scaling with pixel area (tiny test
        # configs stay unaffected).
        area = cfg.size[0] * cfg.size[1]
        eff_batch = max(1, min(eff_batch,
                               int(2 * (512 * 768) / max(area, 1))))
    for start in range(0, len(idxs), eff_batch):
        chunk = idxs[start:start + eff_batch]
        imgs, ref_imgs, masks, prompts, ref_kvs = [], [], [], [], []
        originals, mergeds = [], []
        for idx in chunk:
            refs = generated.adjacent_frames(idx,
                                             cfg.num_ref_for_generation)
            original = video.get_raw_frame(idx)
            if cfg.fused_prep:
                # one program: flow + warp + greedy merge + morphology
                # (padded to num_ref so every frame of every level reuses
                # the same executable)
                merged_d, covered_d, mask2_d, img_d, ref_d = \
                    fused_flow_warp_merge(
                        flow_cache.estimator, video, refs, idx,
                        thres=cfg.mode_thres,
                        expand="none" if crossattn else "dilate",
                        n_pad=cfg.num_ref_for_generation)
                merged = np.asarray(merged_d)
                if crossattn:
                    mask2 = expand_mask(255 - np.asarray(covered_d),
                                        original)
                else:
                    mask2 = np.asarray(mask2_d)
                imgs.append(img_d)        # stays on device
                ref_imgs.append(ref_d)
            else:
                flow_mat = flow_cache.calculate_multiple_to_one(video, refs,
                                                                idx)
                merged, covered = greedy_warp_merge(video, refs, flow_mat,
                                                    cfg.mode_thres)
                mask2 = 255 - covered
                if crossattn:
                    mask2 = expand_mask(mask2, original)
                else:
                    mask2 = np.asarray(dilate(jnp.asarray(mask2),
                                              ellipse_kernel(7))
                                       ).astype(np.uint8)
                imgs.append(np.asarray(bgr_u8_to_model(merged)[0]))
                ref_imgs.append(np.asarray(bgr_u8_to_model(original)[0]))
            masks.append(mask2.astype(np.float32) / 255.0)
            prompts.append(_prompt(tagger, original, cfg.prompt_extra))
            originals.append(original)
            mergeds.append(merged)
            if want_kv:
                kv_list = [video.get_kv(r) for r in refs]
                if prev_chunk_last != -1 and level == 0:
                    kv_list.append(video.get_kv(prev_chunk_last))
                ref_kvs.append(concat_ref_kv(kv_list))

        # One compiled program shape per (batch, kv width): group the
        # chunk's frames by injected-KV token width (they differ only at
        # level transitions / the level-0 chain boundary) and PAD each
        # group to eff_batch by repeating its last frame — noise is
        # drawn once and tiled, so padded slots cannot perturb real
        # outputs, and every level reuses the same compiled program
        # instead of compiling one per remainder size (each fresh
        # compile is minutes through a remote runtime).
        groups: dict = {}
        for pos in range(len(chunk)):
            wk = (None if not want_kv or ref_kvs[pos] is None
                  else ref_kvs[pos][0][0].shape[1])
            groups.setdefault(wk, []).append(pos)

        for wk, poss in groups.items():
            reps = poss + [poss[-1]] * (eff_batch - len(poss))
            stacked_kv = None
            if wk is not None:
                stacked_kv = tuple(
                    (jnp.concatenate([ref_kvs[p][i][0] for p in reps],
                                     axis=0),
                     jnp.concatenate([ref_kvs[p][i][1] for p in reps],
                                     axis=0))
                    for i in range(len(ref_kvs[poss[0]])))
            out = F.img2img_inpaint_batch(
                # jnp.stack keeps fused-prep outputs device-resident
                sd_inpaint, jnp.stack([imgs[p] for p in reps]),
                [prompts[p] for p in reps], NEGATIVE_PROMPT,
                np.stack([masks[p] for p in reps]),
                jnp.stack([ref_imgs[p] for p in reps]),
                denoising_strength=cfg.denoising_strength,
                ddim_steps=cfg.ddim_steps, mask_blur=cfg.mask_blur,
                guidance_schedule_func=cfg.guidance_schedule_func,
                seed=cfg.seed, reference_kv=stacked_kv,
                capture_kv=want_kv)
            out, kv_batch = out if want_kv else (out, None)
            kv_frames = F.split_kv_batch(kv_batch, len(reps)) \
                if kv_batch is not None else [None] * len(reps)

            for j, pos in enumerate(poss):
                idx = chunk[pos]
                frame = model_to_bgr_u8(out[j:j + 1])
                video.put_ai_frame(idx, frame)
                vis = np.concatenate([originals[pos], mergeds[pos], frame],
                                     axis=1)
                write_png(os.path.join(vis_dir, f"{idx:05d}.png"), vis)
                if kv_frames[j] is not None and (
                        level > 0 or pos == len(chunk) - 1):
                    # at level 0 only the chunk's last K/V seeds the
                    # next chunk (serial mode keeps one frame's K/V on
                    # disk)
                    video.put_kv(idx, kv_frames[j])
        if level == 0:
            if prev_chunk_last != -1:
                video.remove_kv(prev_chunk_last)
            prev_chunk_last = chunk[-1]


def generate_seed_frames(sd, tagger, video: VideoWorkspace,
                         seed_indices: FrameIndices,
                         cfg: KeyframeInpaintConfig, control_bundle=None):
    """Render all seed frames jointly as one wide strip img2img
    (:1088-1117); prompt from the first seed frame."""
    frames = [video.get_raw_frame(i) for i in seed_indices]
    strip = np.concatenate(frames, axis=1)
    prompt = _prompt(tagger, frames[0], cfg.prompt_extra)
    out, kv = F.img2img(
        sd, bgr_u8_to_model(strip), prompt, NEGATIVE_PROMPT,
        cfg.denoising_strength, cfg.ddim_steps, seed=cfg.seed,
        capture_kv=cfg.use_reference_kv,
        control_specs=_default_controls(control_bundle, strip),
        # joint seed strips: all tiles are targets — mutual band
        # attraction keeps the seeds coherent (generalization of the
        # reference's 2-tile forward_mfr to n denoised tiles)
        strip=StripConfig(n_tiles=len(seed_indices), mode="mutual")
        if len(seed_indices) > 1 else None,
        sp=cfg.sp)
    strip_bgr = model_to_bgr_u8(out)
    return np.split(strip_bgr, len(seed_indices), axis=1), kv


# ---------------------------------------------------------------------------
# main loop
# ---------------------------------------------------------------------------

def run(video: VideoWorkspace, sd, sd_inpaint, flow_estimator,
        tagger: Optional[Tagger] = None,
        cfg: KeyframeInpaintConfig = KeyframeInpaintConfig(),
        control_bundle=None):
    """Level pyramid -> seed strip -> back-fill (run_exp, :1122-1241)."""
    workspace = video.workspace_dir
    os.makedirs(os.path.join(workspace, "render_vis"), exist_ok=True)
    flow_cache = FlowCache(flow_estimator, workspace, cfg.flow_batch)

    level = 0
    frame_indices = FrameIndices.from_n(video.num_frames)
    history: List[FrameIndices] = [FrameIndices.from_n(video.num_frames)]
    while len(frame_indices) > cfg.n_seed_frames:
        level += 1
        frame_indices = keyframe_conv(
            flow_cache, os.path.join(workspace, f"d{level:02d}"), video,
            frame_indices, cfg.kernel_size, cfg.stride, cfg.dilation)
        history.append(frame_indices)
    flow_cache.purge()
    frame_indices.add(0)

    seed_frames, seed_kv = generate_seed_frames(sd, tagger, video,
                                                frame_indices, cfg,
                                                control_bundle)
    for i, idx in enumerate(frame_indices):
        write_png(os.path.join(workspace, "seed", f"{idx:05d}.png"),
                  seed_frames[i])
        video.put_ai_frame(idx, seed_frames[i])
        if cfg.use_reference_kv and seed_kv is not None:
            video.put_kv(idx, seed_kv)

    generated = history.pop()
    while history:
        level -= 1
        cur = history.pop()
        cur.remove(generated)
        if (cfg.level_batch > 1 and control_bundle is None
                and cfg.mode in ("warp_and_inpaint",
                                 "warp_and_inpaint_crossattn")):
            _backfill_level_batched(sd_inpaint, tagger, video, cur,
                                    generated, flow_cache, cfg,
                                    max(level, 0), workspace)
            generated.add(cur)
            continue
        last_idx = -1
        for idx in cur.indices:
            refs = generated.adjacent_frames(idx, cfg.num_ref_for_generation)
            ref_kv = None
            if cfg.use_reference_kv:
                ref_kv = [video.get_kv(r) for r in refs]
                if last_idx != -1 and level == 0:
                    ref_kv.append(video.get_kv(last_idx))
            os.makedirs(os.path.join(workspace, "render_vis",
                                     f"u{max(level, 0):02d}"), exist_ok=True)
            frame, kv = generate_with_refs(
                sd_inpaint, tagger, video, idx, refs, flow_cache, cfg,
                control_bundle=control_bundle, reference_kv=ref_kv,
                level=max(level, 0), workspace=workspace)
            video.put_ai_frame(idx, frame)
            if cfg.use_reference_kv and kv is not None:
                video.put_kv(idx, kv)
            if last_idx != -1 and level == 0:
                video.remove_kv(last_idx)   # bound the on-disk K/V
            last_idx = idx
        generated.add(cur)
    flow_cache.purge()
    return workspace
