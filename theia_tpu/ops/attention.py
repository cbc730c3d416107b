"""Fused multi-head attention for the student encoders.

Profiling the ViT-tiny train step on v5e showed 43% of device time in the
f32 [B,H,197,197] score materialization + softmax. The generic Pallas flash
attention made things WORSE at these shapes (197 tokens, head_dim 64 — its
padding, segment masking and multi-pass backward dominate), so this module
ships a purpose-built kernel: one grid cell per (batch, head), the whole
197x197 score matrix lives in VMEM, softmax is fused, and the backward pass
is a single recompute kernel. Falls back to the einsum path off-TPU.

implementation:
  - "einsum": XLA path, f32 scores (HF ViT numerics reference)
  - "pallas": custom fused kernel (default on TPU)
  - "flash":  jax.experimental flash attention (kept for comparison)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _einsum_attention(q: jax.Array, k: jax.Array, v: jax.Array, dtype) -> jax.Array:
    """Reference path: [B,T,H,hd] inputs, f32 softmax (HF ViT numerics)."""
    hd = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / math.sqrt(hd), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# custom single-block kernel: grid (B*H,), full sequence per cell
# ---------------------------------------------------------------------------


def _mha_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / l).astype(v.dtype)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / l  # f32 [T, T]
    pb = probs.astype(v.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True)) * scale
    dsb = ds.astype(q.dtype)
    dq_ref[0] = jnp.dot(dsb, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_mha(q, k, v, scale):
    return _pallas_mha_fwd(q, k, v, scale)[0]


def _pallas_call_fwd(q, k, v, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, t, hd = q.shape
    spec = pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_fwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * hd, bytes_accessed=4 * bh * t * hd * 2, transcendentals=bh * t * t
        ),
    )(q, k, v)


def _pallas_mha_fwd(q, k, v, scale):
    out = _pallas_call_fwd(q, k, v, scale)
    return out, (q, k, v)


def _pallas_mha_bwd(scale, res, do):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = res
    bh, t, hd = q.shape
    spec = pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct(q.shape, q.dtype) for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * t * t * hd, bytes_accessed=8 * bh * t * hd * 2, transcendentals=bh * t * t
        ),
    )(q, k, v, do)
    return dq, dk, dv


_pallas_mha.defvjp(_pallas_mha_fwd, _pallas_mha_bwd)


def _pallas_attention(q, k, v, dtype):
    """[B,T,H,hd] -> [B,T,H,hd] through the fused kernel."""
    b, t, h, hd = q.shape
    scale = 1.0 / math.sqrt(hd)

    def pack(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, hd)

    out = _pallas_mha(pack(q), pack(k), pack(v), scale)
    out = out.reshape(b, h, t, hd).transpose(0, 2, 1, 3)
    return out.astype(dtype)


def _flash_attention(q, k, v, dtype):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, t, h, hd = q.shape
    tp = -(-t // 128) * 128
    pad = tp - t

    def to_bhtd(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qf, kf, vf = to_bhtd(q), to_bhtd(k), to_bhtd(v)
    segment_ids = None
    if pad:
        seg = jnp.concatenate(
            [jnp.zeros((b, t), jnp.int32), jnp.ones((b, pad), jnp.int32)], axis=1
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    block = min(tp, 512)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block, block_k_dkv=block,
        block_q_dkv=block, block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(
        qf, kf, vf, segment_ids=segment_ids,
        sm_scale=1.0 / math.sqrt(hd), block_sizes=sizes,
    )
    return jnp.transpose(out[:, :, :t, :], (0, 2, 1, 3)).astype(dtype)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    dtype=None,
    implementation: str = "pallas",
) -> jax.Array:
    """Attention over [B, T, H, hd] tensors -> [B, T, H, hd]."""
    dtype = dtype or q.dtype
    if implementation in ("pallas", "flash") and not _on_tpu():
        implementation = "einsum"
    if implementation == "einsum":
        return _einsum_attention(q, k, v, dtype)
    if implementation == "pallas":
        return _pallas_attention(q, k, v, dtype)
    if implementation == "flash":
        return _flash_attention(q, k, v, dtype)
    raise ValueError(f"unknown attention implementation {implementation!r}")
