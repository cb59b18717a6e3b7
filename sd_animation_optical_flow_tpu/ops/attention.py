"""Attention math for TPU.

The reference runs xformers memory-efficient attention with an optional
fp32 island (reference: ldm/modules/attention.py:326-436, 21,176-181).
Here the default path is XLA attention with float32 softmax; a Pallas
flash-attention kernel (``flash_attention``) handles long-sequence
multi-frame strips and banded biases without materializing the full
score matrix.

Shapes: q [B, Nq, H, D], k/v [B, Nk, H, D] -> out [B, Nq, H, D].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_attention(q, k, v, *, bias=None):
    """Plain XLA attention; softmax in fp32; out dtype follows q."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    # [B, H, Nq, Nk]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention. The specialized inference kernels (banded,
# keymask, MFR) are forward-only; the default routed path is
# differentiable via flash_attention_diff's custom VJP (backward kernels
# further below), so training and guidance-through-attention keep O(N)
# memory at strip lengths.
# ---------------------------------------------------------------------------

# tuned on v5e at SD-1.5 shapes (8 heads, 6144 tokens, d=40), CFG batch
# 16 sweep: 512x1024 17.75ms, 512x2048 16.87, 1024x2048 16.59, 2048x2048
# 16.20 — but tiles above 4MB f32 scores VMEM-OOM inside the fused
# denoise scan, so 512x2048 (4MB) is the largest safe default. The
# kernel sits ~30% over its d=40 MXU-padding ceiling (~12.7ms at b16:
# K/N pad to 128 caps density at 31%); the rest is exp2 VPU + grid.
# Overridable per-run for tuning sweeps (SDAOF_BLOCK_Q / SDAOF_BLOCK_K).
import os as _os
DEFAULT_BLOCK_Q = int(_os.environ.get("SDAOF_BLOCK_Q", "512"))
DEFAULT_BLOCK_K = int(_os.environ.get("SDAOF_BLOCK_K", "2048"))


_LOG2E = math.log2(math.e)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref,
                  *, block_k, kv_len, masked, track_max, d_out):
    """Grid: (batch*heads, num_q_blocks, num_k_blocks). K-loop is the last
    (fastest-moving) grid axis; running max lives in scratch.

    VPU economy (the kernel is softmax-bound, not MXU-bound, at SD head
    dims): q arrives PRE-SCALED by scale*log2(e) so the kernel uses exp2
    and skips the per-element multiply; the K-padding mask is compiled
    out when the sequence divides the block (``masked``); the softmax
    DENOMINATOR rides the PV matmul — v carries an appended ones column
    (launcher), so sum(p) lands in acc[:, d_out] for free on the MXU
    instead of a separate [bq, bk] row-sum pass on the VPU. Finite
    -1e30 stands in for -inf so a fully-masked tile yields exact zeros,
    never NaN."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                 # [bq, d] pre-scaled
    k = k_ref[0]                                 # [bk, d]
    v = v_ref[0]                                 # [bk, d_out + 1] (|ones)

    if track_max:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1)
            s = jnp.where(k_pos < kv_len, s, -1e30)
        m_prev = m_ref[:]                        # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # exp2 on bf16: the weights are rounded to bf16 for the PV
        # matmul anyway; doing the transcendental at bf16 halves the
        # VPU cost of the softmax (measured 1.82 -> 1.61 ms at 6144)
        p = jnp.exp2((s - m_new).astype(v.dtype))
        alpha = jnp.exp2(m_prev - m_new)
        # the ones column of v keeps the denominator in acc[:, d_out],
        # rescaled by alpha exactly like the numerator
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new
    else:
        # max-free accumulation: SD attention logits are bounded (post-LN
        # features, scale 1/sqrt(d)), so exp2(s) cannot overflow f32
        # (needs s*log2e > 127); skipping the running max removes the
        # max-reduce, the alpha rescale of acc, and the m traffic.
        # (Mosaic requires a 32-bit matmul accumulator, so s stays f32
        # out of the MXU; exp2 runs on the bf16 rounding as before.)
        # -1e30-masked entries give exp2(-1e30) == 0 exactly.
        # SDAOF_SAFE_SOFTMAX=1 restores the tracked-max form.
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1)
            s = jnp.where(k_pos < kv_len, s, -1e30)
        p = jnp.exp2(s.astype(v.dtype))
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        acc = acc_ref[:]
        o_ref[0] = (acc[:, :d_out] / acc[:, d_out:d_out + 1]
                    ).astype(o_ref.dtype)


def _flash_kernel_tpv(q_ref, k_ref, vt_ref, o_ref, acc_ref,
                      *, block_k, kv_len, masked, d_out):
    """Max-free flash attention with a TRANSPOSED PV accumulation.

    The standard PV matmul P[bq, bk] @ V[bk, d] pads its OUTPUT lane dim
    d (40 at SD head size, 64 after the launcher pad) to the 128-lane
    MXU width — ~3.2x padded FLOPs. Accumulating the transpose instead,
    acc^T[d+1, bq] += V^T[d+1, bk] @ P^T[bk, bq], keeps the contraction
    on the dense bk axis and moves the short d axis to the SUBLANE dim,
    where it pads only to the 8/16-row granule (41 -> 48): PV drops from
    ~3.2x to ~1.17x padded cost. The QK matmul keeps its inherent d-dim
    contraction padding either way, so scores are computed directly as
    s^T = K @ Q^T. The softmax denominator rides the PV matmul as a ones
    ROW of V^T (acc^T[d_out]); exp2/max-free semantics identical to
    ``_flash_kernel``'s untracked branch."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                 # [bq, d] pre-scaled
    k = k_ref[0]                                 # [bk, d]
    vt = vt_ref[0]                               # [d_out + 1, bk] (|ones row)

    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bk, bq]
    if masked:
        k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, st.shape, dimension=0)
        st = jnp.where(k_pos < kv_len, st, -1e30)
    p = jnp.exp2(st.astype(vt.dtype))            # [bk, bq] bf16 exp2
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # [d_out + 1, bq]

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        acc = acc_ref[:]
        o_ref[0] = (acc[:d_out] / acc[d_out:d_out + 1]
                    ).astype(o_ref.dtype)


def _flash_banded_kernel(q_ref, k_ref, v_ref, qpos_ref, kpos_ref,
                         o_ref, m_ref, l_ref, acc_ref,
                         *, block_q, block_k, kv_len,
                         h, w, radius, weight, sigma, base):
    """Flash attention with the banded strip bias computed ANALYTICALLY
    in-kernel from (query, key) positions — the block-sparse form of the
    reference's Gaussian-decay band bias (attention.py:243-310). At strip
    scale the materialized bias is O(N * n_frames*N) HBM (hundreds of MB
    at 512x768); here it costs a few iota/VPU ops per tile instead.

    Query q -> pixel (q//w, q%w); key kk -> within-frame (kk % (h*w)),
    then the same 2D split. bias = weight*exp(-dist/sigma) inside the
    |dy|,|dx| <= radius band, ``base`` outside."""
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # q pre-scaled by scale*log2e; the bias therefore joins the scores
    # in the log2 domain (see flash_attention_banded)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    # token (y, x) coordinates arrive precomputed (qpos/kpos inputs):
    # in-kernel integer div/mod by the non-power-of-2 width was the
    # kernel's dominant VPU cost (11.0ms -> with this + the weight==0
    # specialization ~the keymask kernel's 4.6ms at 2x6144 keys)
    dy = qpos_ref[0, 0, :][:, None] - kpos_ref[0, 0, :][None, :]
    dx = qpos_ref[0, 1, :][:, None] - kpos_ref[0, 1, :][None, :]
    in_band = (jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius)
    if weight == 0.0:
        # degenerate-but-default bias: 0 in band, ``base`` outside —
        # no distance / transcendental work needed
        s = jnp.where(in_band, s, s + base * _LOG2E)
    else:
        dist = jnp.sqrt((dy * dy + dx * dx).astype(jnp.float32))
        bias = jnp.where(in_band, weight * jnp.exp(-dist / sigma), base)
        s = s + bias * _LOG2E
    k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(k_pos < kv_len, s, -1e30)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2((s - m_new).astype(v.dtype))   # bf16 exp2, see _flash_kernel
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_ref[:] + jnp.sum(
        p.astype(jnp.float32), axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_keymask_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref,
                          *, block_k, kv_len, n_own, n_uncond,
                          heads, d_out):
    """Flash attention with the CFG KV-injection mask computed in-kernel:
    the uncond half of the batch (rows < n_uncond) attends only to its
    own keys (positions < n_own); the cond half sees every reference key
    (unet.py _self_attention semantics, reference attention.py:358-369).
    Avoids materializing the [B, 1, 1, Nk] bias and keeps the long
    injected sequence on the flash path. Max-free accumulation with the
    denominator riding the PV matmul via v's appended ones column (see
    _flash_kernel)."""
    g = pl.program_id(0)                       # folded batch*heads index
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                 # pre-scaled by scale*log2e
    k = k_ref[0]
    v = v_ref[0]                                 # [bk, d_out + 1] (|ones)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    is_uncond = (g // heads) < n_uncond
    s = jnp.where(is_uncond & (k_pos >= n_own), -1e30, s)
    s = jnp.where(k_pos < kv_len, s, -1e30)

    p = jnp.exp2(s.astype(v.dtype))
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        acc = acc_ref[:]
        o_ref[0] = (acc[:, :d_out] / acc[:, d_out:d_out + 1]
                    ).astype(o_ref.dtype)


def _flash_keymask_kernel_tpv(q_ref, k_ref, vt_ref, o_ref, acc_ref,
                              *, block_k, kv_len, n_own, n_uncond,
                              heads, d_out):
    """Transposed-PV form of :func:`_flash_keymask_kernel` (same CFG
    KV-injection mask, same max-free softmax; see _flash_kernel_tpv for
    why the transpose makes PV ~3x denser at SD head dims)."""
    g = pl.program_id(0)                       # folded batch*heads index
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                 # [bq, d] pre-scaled
    k = k_ref[0]                                 # [bk, d]
    vt = vt_ref[0]                               # [d_out + 1, bk]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bk, bq]

    k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, st.shape, dimension=0)
    is_uncond = (g // heads) < n_uncond
    st = jnp.where(is_uncond & (k_pos >= n_own), -1e30, st)
    st = jnp.where(k_pos < kv_len, st, -1e30)

    p = jnp.exp2(st.astype(vt.dtype))
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        acc = acc_ref[:]
        o_ref[0] = (acc[:d_out] / acc[d_out:d_out + 1]
                    ).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, *, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    """Online-softmax attention; O(N) memory in sequence length.

    q [B, Nq, H, D], k/v [B, Nk, H, D] -> [B, Nq, H, D].
    """
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nk, 8))

    # fold scale*log2e into q (exp2 softmax in-kernel, see _flash_kernel)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    # fold heads into batch, pad seq lens to block multiples
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)

    nq_p = pl.cdiv(nq, block_q) * block_q
    nk_p = pl.cdiv(nk, block_k) * block_k
    qf = _pad_to(qf, nq_p, 1)
    kf = _pad_to(kf, nk_p, 1)
    vf = _pad_to(vf, nk_p, 1)

    grid = (b * h, nq_p // block_q, nk_p // block_k)

    # softmax denominator via the MXU: append a ones column to v so
    # sum(p) accumulates in acc[:, d] during the PV matmul (the extra
    # lane is free — MXU output lanes round up to 128 regardless)
    vf = jnp.concatenate(
        [vf, jnp.ones((b * h, nk_p, 1), vf.dtype)], axis=-1)

    track_max = _os.environ.get("SDAOF_SAFE_SOFTMAX", "0") == "1"
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k,
                          kv_len=nk, masked=(nk_p != nk),
                          track_max=track_max, d_out=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qf, kf, vf)

    out = out[:, :nq, :].reshape(b, h, nq, d).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_tpv(q, k, v, *, block_q: int = DEFAULT_BLOCK_Q,
                        block_k: int = DEFAULT_BLOCK_K):
    """Flash attention with the transposed PV accumulation
    (:func:`_flash_kernel_tpv`): V travels transposed with an appended
    ones ROW, the kernel writes o^T, and the launcher transposes back.
    The two host-side relayouts are one pass over K/V and the output
    (~0.2 ms at SD strip shapes) against a ~2-3x denser PV matmul.
    Max-free softmax only (SD-bounded logits, see _flash_kernel)."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nk, 8))

    # fold scale*log2e into q (exp2 softmax in-kernel)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    # v transposed: [b*h, d, nk]
    vt = v.transpose(0, 2, 3, 1).reshape(b * h, d, nk)

    nq_p = pl.cdiv(nq, block_q) * block_q
    nk_p = pl.cdiv(nk, block_k) * block_k
    qf = _pad_to(qf, nq_p, 1)
    kf = _pad_to(kf, nk_p, 1)
    vt = _pad_to(vt, nk_p, 2)

    grid = (b * h, nq_p // block_q, nk_p // block_k)

    # softmax denominator via the MXU: ones ROW appended to v^T so
    # sum(p) accumulates in acc^T[d] during the PV matmul
    vt = jnp.concatenate(
        [vt, jnp.ones((b * h, 1, nk_p), vt.dtype)], axis=1)

    out_t = pl.pallas_call(
        functools.partial(_flash_kernel_tpv, block_k=block_k,
                          kv_len=nk, masked=(nk_p != nk), d_out=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, d + 1, block_k), lambda g, i, j: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda g, i, j: (g, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, nq_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((d + 1, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qf, kf, vt)

    out = out_t[:, :, :nq].reshape(b, h, d, nq).transpose(0, 3, 1, 2)
    return out


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "radius", "weight", "sigma", "base", "block_q", "block_k"))
def flash_attention_banded(q, k, v, *, h: int, w: int, radius: int = 8,
                           weight: float = 0.0, sigma: float = 1.6,
                           base: float = -1000.0,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K):
    """Flash attention whose bias IS the banded strip bias
    (banded_strip_bias semantics) computed analytically per tile —
    O(N)-memory multi-frame strip attention with no bias tensor in HBM.

    q [B, h*w, H, D] (the target tile's tokens); k/v
    [B, n_frames*h*w, H, D] (all strip frames' tokens).
    """
    b, nq, heads, d = q.shape
    nk = k.shape[1]
    assert nq == h * w, "query length must equal one tile (h*w)"
    assert nk % (h * w) == 0, "key length must be whole strip tiles"
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nk, 8))

    # fold scale*log2e into q; kernel softmax runs in the log2 domain
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qf = q.transpose(0, 2, 1, 3).reshape(b * heads, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * heads, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * heads, nk, d)
    nq_p = pl.cdiv(nq, block_q) * block_q
    nk_p = pl.cdiv(nk, block_k) * block_k
    qf = _pad_to(qf, nq_p, 1)
    kf = _pad_to(kf, nk_p, 1)
    vf = _pad_to(vf, nk_p, 1)

    grid = (b * heads, nq_p // block_q, nk_p // block_k)

    # precomputed token coordinates, [1, 2, N] (y-row, x-row) so the
    # kernel does plain subtracts instead of div/mod by the width
    qi = jnp.arange(nq_p, dtype=jnp.int32)
    qpos = jnp.stack([qi // w, qi % w])[None]               # [1, 2, nq_p]
    ki = jnp.arange(nk_p, dtype=jnp.int32) % (h * w)        # frame-local
    kpos = jnp.stack([ki // w, ki % w])[None]               # [1, 2, nk_p]

    out = pl.pallas_call(
        functools.partial(_flash_banded_kernel,
                          block_q=block_q, block_k=block_k, kv_len=nk,
                          h=h, w=w, radius=radius, weight=weight,
                          sigma=sigma, base=base),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, 2, block_q), lambda g, i, j: (0, 0, i)),
            pl.BlockSpec((1, 2, block_k), lambda g, i, j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, nq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qf, kf, vf, qpos, kpos)
    out = out[:, :nq, :].reshape(b, heads, nq, d).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.jit, static_argnames=(
    "n_own", "n_uncond", "block_q", "block_k"))
def flash_attention_keymask(q, k, v, *, n_own: int, n_uncond: int,
                            block_q: int = DEFAULT_BLOCK_Q,
                            block_k: int = DEFAULT_BLOCK_K):
    """Flash attention with the CFG KV-injection key mask (see
    :func:`_flash_keymask_kernel_tpv`). q [B, Nq, H, D]; k/v [B, Nk, H, D].
    Transposed-PV accumulation (same rationale as flash_attention_tpv)."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nk, 8))
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 3, 1).reshape(b * h, d, nk)
    nq_p = pl.cdiv(nq, block_q) * block_q
    nk_p = pl.cdiv(nk, block_k) * block_k
    qf = _pad_to(qf, nq_p, 1)
    kf = _pad_to(kf, nk_p, 1)
    vt = _pad_to(vt, nk_p, 2)
    grid = (b * h, nq_p // block_q, nk_p // block_k)
    vt = jnp.concatenate(
        [vt, jnp.ones((b * h, 1, nk_p), vt.dtype)], axis=1)
    out_t = pl.pallas_call(
        functools.partial(_flash_keymask_kernel_tpv,
                          block_k=block_k, kv_len=nk, n_own=n_own,
                          n_uncond=n_uncond, heads=h, d_out=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, d + 1, block_k), lambda g, i, j: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda g, i, j: (g, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, nq_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((d + 1, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qf, kf, vt)
    return out_t[:, :, :nq].reshape(b, h, d, nq).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# Differentiable flash attention (custom VJP).
#
# The inference kernels above are forward-only; under jax.grad they would
# fail (pallas_call has no auto-derived transpose). Training and
# guidance-through-attention at strip lengths need O(N) memory in the
# BACKWARD too — XLA's attention VJP materializes the [B, H, N, N] score
# matrix twice (fwd residual + bwd), ~9GB at 6k tokens / CFG batch 8.
# ``flash_attention_diff`` keeps the tpv forward and adds two Pallas
# backward kernels that recompute score tiles on the fly (the standard
# flash-attention backward), with the max-free exp2 softmax semantics of
# the forward (SD-bounded logits). Everything stays in the TRANSPOSED
# layout: scores live as s^T [bk, bq], so the per-row softmax denominator
# ``l`` and the D-vector (rowsum(dO*O)) ride as lane-aligned [1, bq] ROWS
# instead of awkward sublane columns.
#
# Backward matmul census per (k, q) tile pair: s^T = K Q^T (d-contraction,
# inherently padded like the forward), dP^T = V dO^T (d-contraction),
# dV += P dO and dK += dS Q and dQ^T += K^T dS (all DENSE bq/bk
# contractions). Gradient matmuls accumulate in f32 for training accuracy
# (the inference forward rounds P to bf16; the backward does not).
# ---------------------------------------------------------------------------

_LN2 = math.log(2.0)


def _interpret():
    # Pallas interpret mode off-TPU: the diff path stays testable on the
    # CPU backend (tests/conftest forces jax_platforms=cpu)
    return jax.default_backend() != "tpu"


def _flash_kernel_tpv_stats(q_ref, k_ref, vt_ref, o_ref, l_ref, acc_ref,
                            *, block_k, kv_len, masked, d_out):
    """Forward with stats: :func:`_flash_kernel_tpv` that ALSO writes the
    softmax denominator row l [1, bq] (residual for the backward)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    vt = vt_ref[0]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if masked:
        k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, st.shape, dimension=0)
        st = jnp.where(k_pos < kv_len, st, -1e30)
    p = jnp.exp2(st.astype(vt.dtype))
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        acc = acc_ref[:]
        o_ref[0] = (acc[:d_out] / acc[d_out:d_out + 1]).astype(o_ref.dtype)
        l_ref[0] = acc[d_out:d_out + 1]


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, l_ref, dvec_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc,
                          *, d):
    """dK/dV for one K block, accumulated over Q blocks (grid axis 2).
    q arrives pre-scaled by scale*log2e (the forward's convention), so
    dK = (dS~ @ q_scaled) * ln2 recovers the natural-log gradient."""
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]                                  # [bk, d]
    v = v_ref[0]                                  # [bk, d]
    qs = q_ref[0]                                 # [bq, d] pre-scaled
    do = do_ref[0]                                # [bq, d]
    l_row = l_ref[0]                              # [1, bq] f32
    d_row = dvec_ref[0]                           # [1, bq] f32

    st = jax.lax.dot_general(k, qs, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bk, bq]
    p = jnp.exp2(st) / l_row                      # normalized P^T, f32
    # dV += P^T @ dO  (dense bq contraction)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dP^T = V @ dO^T  (d contraction)
    dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [bk, bq]
    ds = p * (dpt - d_row)                        # dS_nat^T [bk, bq]
    # dK += ln2 * dS^T @ q_scaled (== scale * dS^T @ q)
    dk_acc[:] = dk_acc[:] + _LN2 * jax.lax.dot_general(
        ds, qs.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, dvec_ref,
                         dqt_ref, dq_acc, *, block_k, kv_len, masked,
                         scale):
    """dQ^T for one Q block, accumulated over K blocks (grid axis 2).
    Padded K positions must be masked here: _pad_to zero-fills K, and
    exp2(0) = 1 would otherwise contribute -P*D to dQ."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    qs = q_ref[0]                                 # [bq, d] pre-scaled
    k = k_ref[0]                                  # [bk, d]
    v = v_ref[0]                                  # [bk, d]
    do = do_ref[0]                                # [bq, d]
    l_row = l_ref[0]                              # [1, bq]
    d_row = dvec_ref[0]                           # [1, bq]

    st = jax.lax.dot_general(k, qs, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bk, bq]
    if masked:
        k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, st.shape, dimension=0)
        st = jnp.where(k_pos < kv_len, st, -1e30)
    p = jnp.exp2(st) / l_row
    dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dpt - d_row)                        # [bk, bq]
    # dQ^T += scale * K^T @ dS^T  (dense bk contraction)
    dq_acc[:] = dq_acc[:] + scale * jax.lax.dot_general(
        k.astype(jnp.float32), ds, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [d, bq]

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        dqt_ref[0] = dq_acc[:].astype(dqt_ref.dtype)


def _flash_fwd_stats(q, k, v, block_q, block_k):
    """tpv forward returning (out, l) with l [b*h, 1, nq_p] f32."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nk, 8))
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qf = qs.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 3, 1).reshape(b * h, d, nk)
    nq_p = pl.cdiv(nq, block_q) * block_q
    nk_p = pl.cdiv(nk, block_k) * block_k
    qf = _pad_to(qf, nq_p, 1)
    kf = _pad_to(kf, nk_p, 1)
    vt = _pad_to(vt, nk_p, 2)
    grid = (b * h, nq_p // block_q, nk_p // block_k)
    vt = jnp.concatenate(
        [vt, jnp.ones((b * h, 1, nk_p), vt.dtype)], axis=1)
    out_t, l = pl.pallas_call(
        functools.partial(_flash_kernel_tpv_stats, block_k=block_k,
                          kv_len=nk, masked=(nk_p != nk), d_out=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, d + 1, block_k), lambda g, i, j: (g, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_q), lambda g, i, j: (g, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda g, i, j: (g, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, nq_p), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, nq_p), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((d + 1, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qf, kf, vt)
    out = out_t[:, :, :nq].reshape(b, h, d, nq).transpose(0, 3, 1, 2)
    return out, l


# backward blocks: square-ish tiles keep both kernels' [bk, bq] f32
# score tile at 1MB (512x512) — small enough beside the f32 grad
# accumulators
BWD_BLOCK_Q = int(_os.environ.get("SDAOF_BWD_BLOCK_Q", "512"))
BWD_BLOCK_K = int(_os.environ.get("SDAOF_BWD_BLOCK_K", "512"))


def _flash_bwd(q, k, v, out, l, do, block_q, block_k):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nk, 8))
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qf = qs.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    of = out.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    dof = do.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    # D = rowsum(dO * O) — one cheap XLA pass, rides as a lane row
    dvec = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                   axis=-1)[:, None, :]                 # [bh, 1, nq]
    nq_p = pl.cdiv(nq, block_q) * block_q
    nk_p = pl.cdiv(nk, block_k) * block_k
    qf = _pad_to(qf, nq_p, 1)
    kf = _pad_to(kf, nk_p, 1)
    vf = _pad_to(vf, nk_p, 1)
    dof = _pad_to(dof, nq_p, 1)
    dvec = _pad_to(dvec, nq_p, 2)
    if l.shape[2] != nq_p:
        # forward/backward block sizes differ: pad l with ONES (padded q
        # rows have zero dO and zero D, so any nonzero l is inert — but
        # zero would divide by zero)
        pad = jnp.ones((b * h, 1, nq_p - l.shape[2]), l.dtype)
        l = jnp.concatenate([l, pad], axis=2)

    masked = nk_p != nk
    grid_kv = (b * h, nk_p // block_k, nq_p // block_q)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, d=d),
        grid=grid_kv,
        in_specs=[
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda g, i, j: (g, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda g, i, j: (g, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nk_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nk_p, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(kf, vf, qf, dof, l, dvec)

    grid_q = (b * h, nq_p // block_q, nk_p // block_k)
    dqt = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                          kv_len=nk, masked=masked, scale=scale),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda g, i, j: (g, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda g, i, j: (g, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda g, i, j: (g, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, nq_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qf, kf, vf, dof, l, dvec)

    dq = dqt[:, :, :nq].reshape(b, h, d, nq).transpose(0, 3, 1, 2)
    dk = dk[:, :nk].reshape(b, h, nk, d).transpose(0, 2, 1, 3)
    dv = dv[:, :nk].reshape(b, h, nk, d).transpose(0, 2, 1, 3)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


@jax.custom_vjp
def flash_attention_diff(q, k, v):
    """:func:`flash_attention_tpv` with a flash BACKWARD (custom VJP):
    O(N) memory in both directions. Max-free exp2 softmax (SD-bounded
    logits) like the inference forward; gradient matmuls accumulate in
    f32. Off-TPU the kernels run in Pallas interpret mode."""
    return flash_attention_tpv(q, k, v) if not _interpret() \
        else _flash_fwd_stats(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)[0]


def _fad_fwd(q, k, v):
    out, l = _flash_fwd_stats(q, k, v, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    return out, (q, k, v, out, l)


def _fad_bwd(res, g):
    q, k, v, out, l = res
    return _flash_bwd(q, k, v, out, l, g, BWD_BLOCK_Q, BWD_BLOCK_K)


flash_attention_diff.defvjp(_fad_fwd, _fad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def shortk_attention(q, k, v, block_q, block_k):
    """Short-K attention via the transposed-PV kernel with the whole
    K/V resident in one kv block (cross-attention to a 231-token
    prompt). Differentiable: the backward recomputes through
    :func:`xla_attention` — at short K the score tensor is small, so
    the XLA backward is cheap and exact to kernel-parity tolerance."""
    return flash_attention_tpv(q, k, v, block_q=block_q, block_k=block_k)


def _shortk_fwd(q, k, v, block_q, block_k):
    return shortk_attention(q, k, v, block_q, block_k), (q, k, v)


def _shortk_bwd(block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(xla_attention, q, k, v)
    return vjp(g)


shortk_attention.defvjp(_shortk_fwd, _shortk_bwd)


def attention_injected(q, k, v, *, n_own: int, n_uncond: int,
                       use_flash: bool | None = None):
    """Attention for the CFG KV-injection path: the first ``n_uncond``
    batch rows only see keys < ``n_own``. Flash path with the analytic
    in-kernel mask on TPU long sequences; XLA with a materialized bias
    otherwise."""
    if use_flash is None:
        import os
        on_tpu = jax.default_backend() == "tpu"
        use_flash = (on_tpu and q.shape[1] >= 1536
                     and os.environ.get("SDAOF_FLASH", "1") != "0")
    if use_flash:
        # the transposed-PV keymask kernel runs unpadded head dims
        # (SD's 40) directly — see flash_attention_tpv
        return flash_attention_keymask(q, k, v, n_own=n_own,
                                       n_uncond=n_uncond)
    b, nk = q.shape[0], k.shape[1]
    key_idx = jnp.arange(nk)
    row = jnp.where(key_idx < n_own, 0.0, -1e9)
    bias = jnp.concatenate(
        [jnp.tile(row[None], (n_uncond, 1)),
         jnp.zeros((b - n_uncond, nk))], axis=0)[:, None, None, :]
    return xla_attention(q, k, v, bias=bias)


def attention(q, k, v, *, bias=None, use_flash: bool | None = None):
    """Dispatch: flash kernel on TPU for long unbiased sequences,
    XLA attention otherwise (bias path and tiny shapes).

    The default transposed-PV kernel runs unpadded head dims (SD-1.5's
    40) directly; only the SDAOF_SAFE_SOFTMAX tracked-max fallback
    zero-pads to a 64 lane multiple (zero feature columns change
    neither the scores nor the output)."""
    if use_flash is None:
        import os
        # default ON for long unbiased sequences on TPU: the XLA path
        # materializes fp32 [B,H,N,N] scores (9GB at 6k tokens, CFG
        # batch 8 — OOM on v5e), the flash kernel streams them through
        # VMEM. Round 1 gated this off for Mosaic compile slowness; that
        # proved to be the remote-compile payload bug (params baked as
        # closure constants), not the kernel. SDAOF_FLASH=0 disables.
        on_tpu = jax.default_backend() == "tpu"
        flash_env = os.environ.get("SDAOF_FLASH", "1") != "0"
        nq, nk = q.shape[1], k.shape[1]
        if (on_tpu and bias is None and flash_env and nq >= 1536
                and nk <= 512 and q.shape[-1] <= 128):
            # short-K cross-attention (231-token prompt): ONE kv block
            # resident per program, large q tiles. Round 2 measured "no
            # win" for short-K kernels with the dispatch-smeared timer;
            # the honest in-program differencing timer says tpv wins
            # big here: 3.01 -> 1.06 ms at 6144x231 CFG-16 (L0), 0.77 ->
            # ~0.05 ms at 1536x231 (L1) — XLA's materialized-score path
            # pays HBM round-trips the kernel keeps in VMEM.
            return shortk_attention(
                q, k, v, min(3072, pl.cdiv(nq, 8) * 8),
                max(128, pl.cdiv(nk, 128) * 128))
        # self-attention / long-K: BOTH sequence axes long. >=1536 on
        # both axes: measured crossover on v5e — flash 0.183ms vs XLA
        # 0.455ms at 1536 tokens, but XLA 0.035ms vs flash 1.17ms at
        # 384 (grid overhead dominates small tiles)
        use_flash = (on_tpu and bias is None and nq >= 1536
                     and nk >= 1536 and flash_env)
    if use_flash and bias is None:
        import os
        d = q.shape[-1]
        if d > 128 and os.environ.get("SDAOF_SAFE_SOFTMAX", "0") != "1":
            # wide heads (VAE mid attention: one head, d=512): the
            # transposed-PV kernel keeps a [d+1, Nq] f32 accumulator
            # resident per batch row — 25MB at 12288 strip tokens,
            # over the 16MB scoped-vmem limit. The tracked-max kernel's
            # per-block [block_q, d] accumulator is what scales here,
            # and d is already lane-aligned so tpv's unpadded-d win is
            # moot. Blocks shrink with d: the default 512x2048 tiles
            # hold ~23MB of f32 K/V at d=512 (compile-time scoped-vmem
            # OOM inside the fused inpaint program).
            return flash_attention(q, k, v, block_q=512, block_k=512)
        if os.environ.get("SDAOF_SAFE_SOFTMAX", "0") == "1":
            # tracked-max fallback kernel (needs lane-aligned head dim)
            d = q.shape[-1]
            dp = -(-d // 64) * 64
            if dp != d:
                # the kernel scales by 1/sqrt(dp); pre-scale q so the
                # effective scale stays 1/sqrt(d)
                q = _pad_to(q, dp, 3) * (math.sqrt(dp) / math.sqrt(d))
                k = _pad_to(k, dp, 3)
                v = _pad_to(v, dp, 3)
                return flash_attention(q, k, v)[..., :d]
            return flash_attention(q, k, v)
        # default: transposed-PV kernel — runs SD's d=40 heads directly
        # (no 64-pad; measured 19.6 -> 14.8 ms at 6144 tok, CFG batch 16).
        # Routed through the custom-VJP wrapper: identical primal, and
        # jax.grad gets the flash backward instead of an error
        return flash_attention_diff(q, k, v)
    return xla_attention(q, k, v, bias=bias)


def sliced_attention(q, k, v, *, slice_size: int = 1024, bias=None):
    """Query-chunked attention for O(n^2)-memory relief — the TPU analog
    of the reference's low-VRAM sliced attention (hack.py:74-113): the
    score matrix is materialized ``slice_size`` query rows at a time.

    q [B, Nq, H, D], k/v [B, Nk, H, D] -> [B, Nq, H, D]. Peak scores
    memory drops from Nq*Nk to slice_size*Nk per head. Prefer
    :func:`flash_attention` on TPU — this exists for bias-carrying or
    interpreter paths where the Pallas kernel is unavailable."""
    nq = q.shape[1]
    outs = []
    for s in range(0, nq, slice_size):
        e = min(s + slice_size, nq)
        b_slice = None if bias is None else bias[..., s:e, :]
        outs.append(xla_attention(q[:, s:e], k, v, bias=b_slice))
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# Multi-frame-rendering (MFR) strip bias — the reference's forward_mfr
# band bias for width-concatenated strips
# ---------------------------------------------------------------------------

# the reference keys sigma by the latent tile height
# (attention.py:256-261 sigma_from_h: {96: 1, 48: 0.8, 24: 0.6, 12: 0.4});
# that table is exactly 0.4 + 0.2*log2(h/12) — use the closed form so
# non-reference resolutions (e.g. landscape h=64) interpolate sanely.
MFR_RADIUS = 6        # attention.py:251 attn_radius
MFR_WEIGHT = 4.0      # attention.py:252 attn_w


def mfr_sigma(h: int) -> float:
    return 0.4 + 0.2 * math.log2(max(h, 1) / 12.0)


def _strip_positions(h: int, w_tile: int, n_tiles: int, n_pad: int):
    """Token coords for a width-concatenated strip flattened row-major:
    token i -> (y, tile, x_local). Returns int32 [1, 3, n_pad] rows
    (y, x_local, tile); indices >= h*n_tiles*w_tile keep their modular
    values (they are masked by the kv_len guard in-kernel)."""
    i = jnp.arange(n_pad, dtype=jnp.int32)
    ws = n_tiles * w_tile
    y = (i // ws) % h
    rem = i % ws
    tile = rem // w_tile
    x = rem % w_tile
    return jnp.stack([y, x, tile])[None]


def mfr_strip_bias(h: int, w_tile: int, n_tiles: int, *,
                   radius: int = MFR_RADIUS, weight: float = MFR_WEIGHT,
                   sigma: float | None = None, mode: str = "target",
                   dtype=jnp.float32):
    """Materialized [N, N] MFR band bias, N = h * n_tiles * w_tile, for a
    width-concatenated strip in ROW-MAJOR flattening (the layout the UNet
    sees when a strip image is reshaped to tokens).

    Semantics follow the reference's forward_mfr
    (ldm/modules/attention.py:243-310): an ADDITIVE attraction of
    ``weight * exp(-dist / sigma)`` from target-tile queries to
    spatially-corresponding reference-tile keys within ``radius`` (2D
    Chebyshev band); 0 elsewhere — the reference leaves its base at 0
    (the -100 fill is commented out at attention.py:270-276).

    mode 'target': only tile-0 queries are attracted to tiles != 0
      (the reference's 2x-strip case: target | reference).
    mode 'mutual': every pair of distinct tiles attracts (the seed-strip
      generalization where all tiles are denoised jointly).
    """
    if sigma is None:
        sigma = mfr_sigma(h)
    n = h * n_tiles * w_tile
    pos = _strip_positions(h, w_tile, n_tiles, n)[0]          # [3, N]
    y, x, tile = pos[0], pos[1], pos[2]
    dy = y[:, None] - y[None, :]
    dx = x[:, None] - x[None, :]
    in_band = (jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius)
    if mode == "target":
        apply = (tile[:, None] == 0) & (tile[None, :] != 0)
    elif mode == "mutual":
        apply = tile[:, None] != tile[None, :]
    else:
        raise ValueError(mode)
    dist = jnp.sqrt((dy * dy + dx * dx).astype(jnp.float32))
    bias = jnp.where(apply & in_band, weight * jnp.exp(-dist / sigma), 0.0)
    return bias.astype(dtype)


def _flash_mfr_kernel(q_ref, k_ref, v_ref, qpos_ref, kpos_ref,
                      o_ref, m_ref, l_ref, acc_ref,
                      *, block_k, kv_len, radius, weight, sigma,
                      target_only):
    """Flash attention with the MFR strip bias computed ANALYTICALLY
    in-kernel from precomputed (y, x_local, tile) token coordinates —
    the O(N)-memory form of :func:`mfr_strip_bias` (a materialized bias
    at 512x768 2-strips is [12288, 12288] f32 = 600MB of HBM)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # pre-scaled by scale*log2e
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    dy = qpos_ref[0, 0, :][:, None] - kpos_ref[0, 0, :][None, :]
    dx = qpos_ref[0, 1, :][:, None] - kpos_ref[0, 1, :][None, :]
    qt = qpos_ref[0, 2, :][:, None]
    kt = kpos_ref[0, 2, :][None, :]
    in_band = (jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius)
    if target_only:
        apply = in_band & (qt == 0) & (kt != 0)
    else:
        apply = in_band & (qt != kt)
    dist = jnp.sqrt((dy * dy + dx * dx).astype(jnp.float32))
    # bias joins the scores in the log2 domain (q pre-scaled by log2e)
    s = jnp.where(apply, s + (weight * _LOG2E) * jnp.exp(-dist / sigma), s)

    k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(k_pos < kv_len, s, -1e30)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2((s - m_new).astype(v.dtype))
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_ref[:] + jnp.sum(
        p.astype(jnp.float32), axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "h", "w_tile", "n_tiles", "radius", "weight", "sigma", "mode",
    "block_q", "block_k", "interpret"))
def flash_attention_mfr(q, k, v, *, h: int, w_tile: int, n_tiles: int,
                        radius: int = MFR_RADIUS,
                        weight: float = MFR_WEIGHT,
                        sigma: float | None = None, mode: str = "target",
                        block_q: int = DEFAULT_BLOCK_Q,
                        block_k: int = DEFAULT_BLOCK_K,
                        interpret: bool = False):
    """Strip self-attention with the analytic in-kernel MFR band bias.

    q/k/v [B, N, H, D] with N = h * n_tiles * w_tile (the full strip,
    row-major). Matches xla_attention(..., bias=mfr_strip_bias(...))."""
    if sigma is None:
        sigma = mfr_sigma(h)
    b, nq, heads, d = q.shape
    nk = k.shape[1]
    assert nq == h * n_tiles * w_tile and nk == nq, \
        "MFR strip attention is full-strip self-attention"
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nk, 8))

    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qf = q.transpose(0, 2, 1, 3).reshape(b * heads, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * heads, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * heads, nk, d)
    nq_p = pl.cdiv(nq, block_q) * block_q
    nk_p = pl.cdiv(nk, block_k) * block_k
    qf = _pad_to(qf, nq_p, 1)
    kf = _pad_to(kf, nk_p, 1)
    vf = _pad_to(vf, nk_p, 1)
    grid = (b * heads, nq_p // block_q, nk_p // block_k)

    qpos = _strip_positions(h, w_tile, n_tiles, nq_p)
    kpos = _strip_positions(h, w_tile, n_tiles, nk_p)

    out = pl.pallas_call(
        functools.partial(_flash_mfr_kernel, block_k=block_k, kv_len=nk,
                          radius=radius, weight=float(weight),
                          sigma=float(sigma), target_only=(mode == "target")),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, 3, block_q), lambda g, i, j: (0, 0, i)),
            pl.BlockSpec((1, 3, block_k), lambda g, i, j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, nq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, qpos, kpos)
    out = out[:, :nq, :].reshape(b, heads, nq, d).transpose(0, 2, 1, 3)
    return out


def strip_attention(q, k, v, *, h: int, w_strip: int, n_tiles: int,
                    mode: str = "target", use_flash: bool | None = None):
    """Self-attention over a width-concatenated strip with the MFR band
    bias (reference forward_mfr, attention.py:220-324). Routes to the
    analytic Pallas kernel on TPU; materializes the bias for XLA
    otherwise (tests / CPU). q/k/v [B, h*w_strip, H, D]."""
    assert w_strip % n_tiles == 0, "strip width must split into tiles"
    w_tile = w_strip // n_tiles
    if use_flash is None:
        import os
        use_flash = (jax.default_backend() == "tpu"
                     and q.shape[1] >= 1536
                     and os.environ.get("SDAOF_FLASH", "1") != "0")
    if use_flash:
        d = q.shape[-1]
        dp = -(-d // 64) * 64
        if dp != d:
            q = _pad_to(q, dp, 3) * (math.sqrt(dp) / math.sqrt(d))
            k = _pad_to(k, dp, 3)
            v = _pad_to(v, dp, 3)
            out = flash_attention_mfr(q, k, v, h=h, w_tile=w_tile,
                                      n_tiles=n_tiles, mode=mode)
            return out[..., :d]
        return flash_attention_mfr(q, k, v, h=h, w_tile=w_tile,
                                   n_tiles=n_tiles, mode=mode)
    bias = mfr_strip_bias(h, w_tile, n_tiles, mode=mode)[None, None]
    return xla_attention(q, k, v, bias=bias)


# ---------------------------------------------------------------------------
# Banded cross-frame attention bias (multi-frame strips)
# ---------------------------------------------------------------------------

def banded_strip_bias(h: int, w: int, n_frames: int, *, radius: int = 8,
                      weight: float = 0.0, sigma: float = 1.6,
                      base: float = -1000.0, dtype=jnp.float32):
    """Band-diagonal bias for width-concatenated multi-frame self-attention.

    Re-design of the reference's Gaussian-decay band bias that keeps a
    strip pixel attending mostly to spatially-corresponding columns of the
    reference half (reference: ldm/modules/attention.py:243-310), built
    vectorized instead of with Python pixel loops. Returns
    [h*w, n_frames*h*w]: block (y, x) of size w×w gets a diagonal band of
    exp(-dist/sigma) weights within ``radius``, ``base`` elsewhere.
    """
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    # block-level distance between rows (query y) and cols (key y)
    by = ys[:, None] - ys[None, :]                       # [h, h]
    # within-block column offsets
    bx = xs[:, None] - xs[None, :]                       # [w, w]
    dist = jnp.sqrt((by[:, None, :, None] ** 2 + bx[None, :, None, :] ** 2)
                    .astype(jnp.float32))                # [h, w, h, w]
    val = weight * jnp.exp(-dist / sigma)
    in_band = (jnp.abs(by)[:, None, :, None] <= radius) & \
              (jnp.abs(bx)[None, :, None, :] <= radius)
    bias = jnp.where(in_band, val, base)
    bias = bias.reshape(h * w, h * w)
    bias = jnp.tile(bias, (1, n_frames))
    return bias.astype(dtype)
