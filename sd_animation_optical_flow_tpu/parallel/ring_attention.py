"""Ring attention: sequence-parallel self-attention over ICI.

The reference scales multi-frame joint denoising by width-concatenating
frames so self-attention spans n*H*W tokens in one device's memory
(reference: ofgen_keyframe_inpaint.py:824-858, attention.py:243-310).
The TPU-native equivalent shards that token axis across the mesh: each
chip holds a slice of Q/K/V, K/V blocks rotate around the ring via
ppermute, and softmax is accumulated online — O(N/devices) memory per
chip, compute overlapping communication (SURVEY §2.7 sequence-parallel
row).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attn_local(q, k, v, axis_name: str):
    """Per-shard body. q/k/v [B, n_local, H, D]."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    n_dev = jax.lax.psum(1, axis_name)

    qf = q.astype(jnp.float32)
    m = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)            # [B,n,H]
    l = jnp.zeros(q.shape[:3], jnp.float32)
    acc = jnp.zeros(qf.shape, jnp.float32)

    def step(i, carry):
        m, l, acc, k_blk, v_blk = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        s = s.transpose(0, 2, 1, 3)                              # [B,q,H,k]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bqhk,bkhd->bqhd",
                        p.transpose(0, 1, 2, 3),
                        v_blk.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        acc_new = acc * alpha[..., None] + pv
        # rotate K/V to the next chip (skip after the last block)
        k_nxt = jax.lax.ppermute(
            k_blk, axis_name,
            [(j, (j + 1) % n_dev) for j in range(n_dev)])
        v_nxt = jax.lax.ppermute(
            v_blk, axis_name,
            [(j, (j + 1) % n_dev) for j in range(n_dev)])
        return m_new, l_new, acc_new, k_nxt, v_nxt

    m, l, acc, _, _ = jax.lax.fori_loop(0, n_dev, step, (m, l, acc, k, v))
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, *, seq_axis: str = "dp"):
    """Sharded self-attention. q/k/v [B, N, H, D] with N sharded over
    ``seq_axis``; returns [B, N, H, D] with the same sharding."""
    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        functools.partial(_ring_attn_local, axis_name=seq_axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False)
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# Ulysses-style sequence parallelism (all-to-all head scatter)
# ---------------------------------------------------------------------------

def _ulysses_local(q, k, v, axis_name: str, attn_fn=None):
    """Per-shard body: all-to-all reshards sequence-sharded [B, n_loc, H, D]
    into head-sharded [B, N, H/dev, D], runs FULL-sequence attention
    locally on the owned heads, and all-to-alls back.

    ``attn_fn(qh, kh, vh) -> [B, N, H/dev, D]`` replaces the plain
    softmax attention — this is how biased variants (the MFR strip band
    kernel) compose with sequence parallelism: every chip sees the full
    sequence for its heads, so position-dependent biases need no
    re-indexing."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)

    def seq_to_heads(x):
        # tiled all-to-all: split the head axis across the mesh, gather
        # the full sequence — [B, n_loc, H, D] -> [B, N, H/dev, D]
        return jax.lax.all_to_all(x, axis_name, split_axis=2,
                                  concat_axis=1, tiled=True)

    def heads_to_seq(x):
        # inverse reshard: [B, N, H/dev, D] -> [B, n_loc, H, D]
        return jax.lax.all_to_all(x, axis_name, split_axis=1,
                                  concat_axis=2, tiled=True)

    qh = seq_to_heads(q)
    kh = seq_to_heads(k)
    vh = seq_to_heads(v)
    if attn_fn is not None:
        o = attn_fn(qh, kh, vh).astype(q.dtype)
        return heads_to_seq(o)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                   kh.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(qh.dtype), vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return heads_to_seq(o)


def ulysses_attention(q, k, v, mesh: Mesh, *, seq_axis: str = "dp",
                      attn_fn=None):
    """Ulysses-style sequence-parallel self-attention (SURVEY §2.7: the
    all-to-all head-scatter alternative to ring attention): one
    all-to-all converts the sequence sharding into a head sharding, each
    chip runs full-sequence attention over H/devices heads, and a second
    all-to-all restores the sequence sharding. Requires H % devices == 0.

    q/k/v [B, N, H, D] with N sharded over ``seq_axis``."""
    n_dev = mesh.shape[seq_axis]
    assert q.shape[2] % n_dev == 0, "heads must divide the mesh axis"
    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        functools.partial(_ulysses_local, axis_name=seq_axis,
                          attn_fn=attn_fn),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False)
    return fn(q, k, v)
