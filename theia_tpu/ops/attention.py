"""Fused multi-head attention for the student encoders.

Profiling the ViT-tiny train step on v5e showed 43% of device time in the
f32 [B,H,197,197] score materialization + softmax and another ~10% in
head-split layout copies. This wrapper routes attention through the Pallas
TPU flash-attention kernel (scores never leave VMEM), padding the 197-token
sequence to a lane-aligned length with segment-id masking.

Falls back to the plain einsum path off-TPU (pallas kernels don't run on the
CPU test mesh) or when disabled.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    if jax.default_backend() != "tpu":
        return False
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention  # noqa

        return True
    except Exception:  # pragma: no cover
        return False


def _einsum_attention(q: jax.Array, k: jax.Array, v: jax.Array, dtype) -> jax.Array:
    """Reference path: [B,T,H,hd] inputs, f32 softmax (HF ViT numerics)."""
    hd = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / math.sqrt(hd), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, dtype=None, use_flash: bool = True
) -> jax.Array:
    """Attention over [B, T, H, hd] tensors -> [B, T, H, hd]."""
    dtype = dtype or q.dtype
    t = q.shape[1]
    if not (use_flash and _flash_available()):
        return _einsum_attention(q, k, v, dtype)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, _, h, hd = q.shape
    tp = -(-t // 128) * 128  # pad to lane multiple
    pad = tp - t

    def to_bhtd(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B,H,T,hd]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qf, kf, vf = to_bhtd(q), to_bhtd(k), to_bhtd(v)
    if pad:
        seg = jnp.concatenate(
            [jnp.zeros((b, t), jnp.int32), jnp.ones((b, pad), jnp.int32)], axis=1
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
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
    out = out[:, :, :t, :]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(dtype)
