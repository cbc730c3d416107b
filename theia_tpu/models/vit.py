"""TPU-native ViT/DeiT student backbones.

Re-implements the reference's three backbone variants (standard DeiT with
CLS, DeiT-NoCLS, DeiT with register tokens — reference:
src/theia/models/backbones.py:26-526) as one Flax module, designed TPU-first:

- uint8 preprocessing (resize/rescale/normalize, DeiT AutoProcessor
  semantics) is traced into the same XLA program instead of running on the
  host per batch (reference inefficiency at backbones.py:337-339);
- the 16x16 patch conv is expressed as extract-patches + matmul so it lands
  on the MXU directly;
- all shapes are static; the 197(+reg)-token encoder fuses fully under jit.

Weight layout is convertible 1:1 from HF ViTModel state dicts (see
theia_tpu/models/hf_convert.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

import functools

import numpy as np

from theia_tpu.ops.image import _cubic_kernel, bicubic_resize, preprocess_images
from theia_tpu.ops.init import trunc_normal_init


@functools.lru_cache(maxsize=8)
def _fused_resize_patch_matrix(
    in_size: int = 224, resize_size: int = 256, crop_size: int = 224, patch: int = 16,
    a: float = -0.5,
) -> tuple[np.ndarray, int, int]:
    """Per-patch 1D resampling weights composing resize+crop+patchify.

    The DeiT preprocessing (resize 224->256 bicubic, center-crop 224) and the
    16x16 patch split compose into a strided convolution because the input
    stride per patch is exact: patch * in/resize = 16 * 224/256 = 14.0, so
    every patch sees identical fractional tap offsets.

    Returns (A [patch, K], window_start, K): output-pixel py of any patch
    draws input pixels window_start + 14*i + d with weight A[py, d]
    (tap indices may run past the image; border clamping == edge padding).
    """
    scale = in_size / resize_size
    if abs(patch * scale - round(patch * scale)) > 1e-9:
        raise ValueError("fused preprocessing requires integer input stride per patch")
    crop0 = (resize_size - crop_size) // 2
    # source positions for the first patch's output pixels
    src = (np.arange(patch) + crop0 + 0.5) * scale - 0.5
    lo = int(np.floor(src.min() - 2))
    hi = int(np.ceil(src.max() + 2))
    k = hi - lo + 1
    A = np.zeros((patch, k), np.float64)
    for py in range(patch):
        taps = lo + np.arange(k)
        w = _cubic_kernel(src[py] - taps, a)
        s = w.sum()
        A[py] = w / s if s != 0 else w
    return A.astype(np.float32), lo, k


# fast_math attention context layout: "bqhd" = transpose back to token-major
# before the output projection; "bhqd_fused" = contract (head, head_dim) in
# the projection einsum. Measured on TPU v5e (benchmarks/
# probe_tiny_variants.py, tiny cddsv B=256): bhqd_fused 96.4 ms vs bqhd
# 97.3 ms — the transpose-back copy never materializes; default on.
# Round-5 probe layouts (benchmarks/probe_attn_repack.py), both numerically
# identical to bhqd_fused (tests/test_r5_levers.py):
#   "merged_batch" — (b, h) merged into one batch dim for the score/context
#     matmuls. Measured NEUTRAL at base (141.6 vs 141.6/141.7 ms bracket —
#     XLA already lowers the nested batch dims to the same batched gemm) and
#     -2.5% at tiny (the explicit transposes materialize there).
#   "dpad128" — q/k/v zero-padded from head_dim 64 to 128 to fill the MXU's
#     128-lane contraction depth (zero products keep scores bitwise).
#     Measured NEGATIVE both sizes (base +5.2%, tiny +5.5% step time): the
#     2x score FLOPs buy no tiling win — d=64 was not the bottleneck.
# Both kept opt-in as the measured record (2026-08-20); with round 1's
# neutral single-block Pallas MHA and round 3's refuted token padding, base
# attention stands measured at XLA's floor.
ATTN_LAYOUT = "bhqd_fused"

# Masked token padding to a tile multiple: 197 tokens (1 CLS + 196 patches)
# tile badly on TPU — the [.,197]-minor score matrix pads to 256 lanes and
# every [197,.] sublane dim leaves partial tiles. Setting this to a multiple
# M pads the sequence to the next multiple of M after the pos-embed add,
# masks pad KEYS with -inf in every attention (exp(-inf)=0: real-token
# outputs are bit-identical math), and slices pads off before the final
# LayerNorm. Pad tokens never influence real tokens (attention is the only
# cross-token op in a ViT) and their cotangents are zero through the slice,
# so weight gradients are unchanged too. 0 disables. Candidates: 8 (197 ->
# 200), 16 (-> 208), 64/128 (-> 256).
TOKEN_PAD_MULTIPLE = 0


@dataclasses.dataclass(frozen=True)
class ViTBackboneConfig:
    """Static config of a ViT/DeiT-style encoder (matches HF ViTConfig fields)."""

    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    intermediate_size: int = 1536
    patch_size: int = 16
    image_size: int = 224
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    qkv_bias: bool = True
    # preprocessing (DeiT AutoProcessor defaults)
    resize_size: int = 256
    crop_size: int = 224
    image_mean: tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: tuple[float, float, float] = (0.5, 0.5, 0.5)
    # attention kernel: "pallas" (custom fused kernel, TPU), "einsum" (XLA),
    # or "flash" (generic pallas flash attention); non-TPU always einsum
    attention_impl: str = "einsum"
    # trade exactness for VPU throughput in the training hot path:
    # bf16 attention scores/softmax and tanh-approximated gelu
    fast_math: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def spatial(self) -> int:
        return self.image_size // self.patch_size


# Student sizes used by the reference configs
# (reference: src/theia/configs/model/backbone/*.yaml; backbones.py:269,348,429).
_DEIT_SIZES = {
    "deit-tiny-patch16-224": dict(hidden_size=192, num_heads=3, intermediate_size=768),
    "deit-small-patch16-224": dict(hidden_size=384, num_heads=6, intermediate_size=1536),
    "deit-base-patch16-224": dict(hidden_size=768, num_heads=12, intermediate_size=3072),
}

BACKBONE_CONFIGS: dict[str, ViTBackboneConfig] = {}
for _sz, _kw in _DEIT_SIZES.items():
    for _prefix in ("", "nocls-", "reg-"):
        BACKBONE_CONFIGS[f"{_prefix}facebook/{_sz}"] = ViTBackboneConfig(**_kw)


class _QKVParams(nn.Module):
    """Parameter holder keeping the HF-compatible query/key/value tree path
    while the block computes one packed QKV matmul (fewer small matmuls,
    ONE bias-grad reduction per layer instead of three)."""

    features: int
    init_std: float
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", trunc_normal_init(self.init_std), (self.features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return kernel, bias


class _TransformerBlock(nn.Module):
    """Pre-LN ViT encoder block matching HF ViTLayer numerics exactly."""

    cfg: ViTBackboneConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, key_mask: Optional[jax.Array] = None) -> jax.Array:
        """key_mask: optional [1,1,1,T] additive score mask (-inf on pad
        keys) for TOKEN_PAD_MULTIPLE sequences."""
        cfg = self.cfg
        c = cfg.hidden_size
        nh = cfg.num_heads
        hd = c // nh

        def masked(scores: jax.Array) -> jax.Array:
            return scores if key_mask is None else scores + key_mask.astype(scores.dtype)
        dense = lambda feats, name, use_bias=True: nn.Dense(
            feats,
            name=name,
            use_bias=use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            bias_init=nn.initializers.zeros,
        )
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name=name, dtype=self.dtype, param_dtype=jnp.float32
        )

        h = ln("layernorm_before")(x)
        b, t, _ = h.shape
        # packed QKV: column-block matmul is bitwise identical to three
        # separate matmuls (per-column accumulation is independent)
        wk_bk = [
            _QKVParams(c, cfg.initializer_range, cfg.qkv_bias, name=n)()
            for n in ("query", "key", "value")
        ]
        w_qkv = jnp.concatenate([w for w, _ in wk_bk], axis=1).astype(self.dtype)

        def proj_out_bhqd(ctx: jax.Array) -> jax.Array:
            # contract (h, d) directly in the output projection so the
            # [B,T,H,hd] transpose-back copy never materializes
            wo, bo = _QKVParams(c, cfg.initializer_range, True, name="attention_output")()
            return (
                jnp.einsum("bhqd,hdc->bqc", ctx, wo.reshape(nh, hd, c).astype(self.dtype))
                + bo.astype(self.dtype)
            )

        if cfg.fast_math and ATTN_LAYOUT == "packed_bhqd":
            # one projection einsum emitting q/k/v directly in [b,h,t,d].
            # Measured NEUTRAL at tiny / -0.8% at base (benchmarks/
            # probe_packed_qkv.py) — the split-path copies are already fused
            # away by XLA, so this stays opt-in. Bitwise identical to the
            # split path (same matmul, same contraction order).
            qkv = jnp.einsum("btc,cghd->bghtd", h, w_qkv.reshape(c, 3, nh, hd))
            if cfg.qkv_bias:
                b_qkv = jnp.concatenate([bb for _, bb in wk_bk]).astype(self.dtype)
                qkv = qkv + b_qkv.reshape(3, nh, 1, hd)[None]
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=self.dtype)
            probs = jax.nn.softmax(masked(scores.astype(self.dtype)) / math.sqrt(hd), axis=-1)
            x = x + proj_out_bhqd(jnp.einsum("bhqk,bhkd->bhqd", probs, v))
        else:
            qkv = jnp.dot(h, w_qkv)
            if cfg.qkv_bias:
                qkv = qkv + jnp.concatenate([bb for _, bb in wk_bk]).astype(self.dtype)
            q, k, v = (y.reshape(b, t, nh, hd) for y in jnp.split(qkv, 3, axis=-1))
            if cfg.fast_math and ATTN_LAYOUT == "bhqd_fused":
                scores = jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k, preferred_element_type=self.dtype
                )
                probs = jax.nn.softmax(masked(scores.astype(self.dtype)) / math.sqrt(hd), axis=-1)
                x = x + proj_out_bhqd(jnp.einsum("bhqk,bkhd->bhqd", probs, v))
            elif cfg.fast_math and ATTN_LAYOUT == "merged_batch":
                # (b, h) merged into one batch dim: bitwise-identical matmuls,
                # but XLA tiles ONE b*h-deep batched gemm
                qm = q.transpose(0, 2, 1, 3).reshape(b * nh, t, hd)
                km = k.transpose(0, 2, 1, 3).reshape(b * nh, t, hd)
                vm = v.transpose(0, 2, 1, 3).reshape(b * nh, t, hd)
                scores = jnp.einsum(
                    "xqd,xkd->xqk", qm, km, preferred_element_type=self.dtype
                ).reshape(b, nh, t, t)
                probs = jax.nn.softmax(masked(scores.astype(self.dtype)) / math.sqrt(hd), axis=-1)
                ctx = jnp.einsum("xqk,xkd->xqd", probs.reshape(b * nh, t, t), vm)
                x = x + proj_out_bhqd(ctx.reshape(b, nh, t, hd))
            elif cfg.fast_math and ATTN_LAYOUT == "dpad128":
                # zero-pad head_dim to the MXU's 128-lane depth: the extra
                # contraction lanes are zero products (scores bitwise equal),
                # the context pad columns are exactly zero and sliced off
                dp = max(0, 128 - hd)
                pad_d = ((0, 0), (0, 0), (0, 0), (0, dp))
                qp, kp, vp = (jnp.pad(y, pad_d) for y in (q, k, v))
                scores = jnp.einsum(
                    "bqhd,bkhd->bhqk", qp, kp, preferred_element_type=self.dtype
                )
                probs = jax.nn.softmax(masked(scores.astype(self.dtype)) / math.sqrt(hd), axis=-1)
                ctx = jnp.einsum("bhqk,bkhd->bhqd", probs, vp)[..., :hd]
                x = x + proj_out_bhqd(ctx)
            elif cfg.fast_math:
                scores = jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k, preferred_element_type=self.dtype
                )
                probs = jax.nn.softmax(masked(scores.astype(self.dtype)) / math.sqrt(hd), axis=-1)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)
                x = x + dense(c, "attention_output")(ctx)
            elif key_mask is not None:
                if cfg.attention_impl != "einsum":
                    raise ValueError(
                        "TOKEN_PAD_MULTIPLE requires attention_impl='einsum' "
                        f"(got {cfg.attention_impl!r}): the pallas/flash "
                        "kernels take no score mask, and silently swapping "
                        "the implementation would invalidate any A/B"
                    )
                # masked exact path: f32 scores like _einsum_attention
                scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
                probs = jax.nn.softmax(masked(scores) / math.sqrt(hd), axis=-1).astype(self.dtype)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)
                x = x + dense(c, "attention_output")(ctx)
            else:
                from theia_tpu.ops.attention import multi_head_attention

                ctx = multi_head_attention(
                    q, k, v, dtype=self.dtype, implementation=cfg.attention_impl
                ).reshape(b, t, c)
                x = x + dense(c, "attention_output")(ctx)

        h = ln("layernorm_after")(x)
        h = dense(cfg.intermediate_size, "intermediate")(h)
        h = jax.nn.gelu(h, approximate=cfg.fast_math)
        x = x + dense(c, "output")(h)
        return x


class ViTBackbone(nn.Module):
    """ViT/DeiT student backbone with cls / nocls / reg variants.

    variant:
      - "cls": standard DeiT; output tokens [B, 1+N, C]
        (reference: src/theia/models/backbones.py:255-341).
      - "nocls": no CLS token; pos embed keeps the (1, 1+N, C) shape but only
        [:, 1:] is added (backbones.py:26-125, :91); output [B, N, C].
      - "reg": CLS + patches + num_reg_tokens trailing register tokens with a
        separate learned reg pos embed (backbones.py:129-252); output
        [B, 1+N+R, C].
    """

    cfg: ViTBackboneConfig
    variant: str = "cls"  # "cls" | "nocls" | "reg"
    num_reg_tokens: int = 0
    dtype: Any = jnp.float32
    # Fold resize+crop+rescale+normalize+patch-embed into ONE strided conv on
    # raw uint8 pixels (everything is linear; see _fused_resize_patch_matrix).
    # Skips the PIL inter-pass uint8 rounding (sub-LSB divergence); intended
    # for the training hot path.
    fuse_preprocessing: bool = False

    def setup(self) -> None:
        cfg = self.cfg
        c = cfg.hidden_size
        p = cfg.patch_size
        init = trunc_normal_init(cfg.initializer_range)
        # patch embedding as a matmul kernel, element order (kh, kw, cin)
        self.patch_kernel = self.param("patch_kernel", init, (p * p * 3, c))
        self.patch_bias = self.param("patch_bias", nn.initializers.zeros, (c,))
        # position embeddings always stored (1, 1+N, C) to match reference
        # weight shapes across variants
        self.position_embeddings = self.param(
            "position_embeddings", init, (1, 1 + cfg.num_patches, c)
        )
        if self.variant != "nocls":
            self.cls_token = self.param("cls_token", init, (1, 1, c))
        if self.variant == "reg":
            if self.num_reg_tokens <= 0:
                raise ValueError("reg variant requires num_reg_tokens > 0")
            self.reg_token = self.param("reg_token", init, (1, self.num_reg_tokens, c))
            self.reg_pos_embed = self.param("reg_pos_embed", init, (1, self.num_reg_tokens, c))
        self.blocks = [
            _TransformerBlock(cfg, dtype=self.dtype, name=f"block_{i}")
            for i in range(cfg.num_layers)
        ]
        self.final_layernorm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="layernorm", dtype=self.dtype, param_dtype=jnp.float32
        )

    @property
    def no_cls(self) -> bool:
        return self.variant == "nocls"

    def get_feature_size(self, keep_spatial: bool = False) -> tuple[int, ...]:
        """Backbone feature size, computed statically (the reference probes it
        with a dummy uint8 forward; backbones.py:287-312)."""
        cfg = self.cfg
        if keep_spatial:
            return (cfg.hidden_size, cfg.spatial, cfg.spatial)
        return (cfg.hidden_size, cfg.num_patches)

    def _patch_embed(self, x: jax.Array) -> jax.Array:
        """[B,H,W,3] float -> [B,N,C] via extract-patches + matmul (MXU path)."""
        cfg = self.cfg
        b, h, w, c_in = x.shape
        p = cfg.patch_size
        nh, nw = h // p, w // p
        x = x.reshape(b, nh, p, nw, p, c_in)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, p * p * c_in)
        return (
            jnp.dot(x, self.patch_kernel.astype(self.dtype), preferred_element_type=jnp.float32)
            + self.patch_bias
        ).astype(self.dtype)

    def _fused_embed(self, x: jax.Array) -> jax.Array:
        """uint8 [B,H,W,3] -> [B,N,C] via ONE composite strided conv.

        The composite kernel contracts the per-patch resize weights A with
        the patch matmul kernel; rescale+normalize fold into a per-channel
        row scale and a bias shift (uint8 values are exact in bf16)."""
        cfg = self.cfg
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 2, 3, 1))
        b = x.shape[0]
        p = cfg.patch_size
        A_np, lo, k = _fused_resize_patch_matrix(
            cfg.image_size, cfg.resize_size, cfg.crop_size, p
        )
        A = jnp.asarray(A_np, jnp.float32)
        stride = p * cfg.image_size // cfg.resize_size
        n = cfg.spatial

        mean = jnp.asarray(cfg.image_mean, jnp.float32)
        std = jnp.asarray(cfg.image_std, jnp.float32)
        s = 1.0 / (255.0 * std)          # per-channel scale on raw uint8
        t = -mean / std                   # per-channel shift

        wp = self.patch_kernel.reshape(p, p, 3, cfg.hidden_size)
        w_scaled = wp * s[None, None, :, None]
        # composite conv kernel [K, K, 3, C]
        wc = jnp.einsum("pk,qm,pqcd->kmcd", A, A, w_scaled)
        # normalization shift: constant 1 per pixel through the patch weights
        bc = self.patch_bias + jnp.einsum("c,pqcd->d", t, wp.astype(jnp.float32))

        # edge padding reproduces the resize's border clamping exactly
        pad_hi = lo + stride * (n - 1) + (k - 1) - (cfg.image_size - 1)
        xf = x.astype(self.dtype)
        xf = jnp.pad(xf, ((0, 0), (0, max(pad_hi, 0)), (0, max(pad_hi, 0)), (0, 0)), mode="edge")
        xf = xf[:, lo:, lo:, :]
        y = jax.lax.conv_general_dilated(
            xf,
            wc.astype(self.dtype),
            window_strides=(stride, stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bc.astype(self.dtype)
        return y.reshape(b, n * n, cfg.hidden_size).astype(self.dtype)

    def _interp_patch_pos(self, nh: int, nw: int) -> jax.Array:
        """Bicubic pos-embed interpolation with the reference's h0+0.1 quirk
        (backbones.py:39-69): torch bicubic (a=-0.75), scale=(h0+0.1)/sqrt(N)."""
        cfg = self.cfg
        n = cfg.num_patches
        s = int(math.sqrt(n))
        patch_pos = self.position_embeddings[:, 1:].reshape(1, s, s, cfg.hidden_size)
        out = bicubic_resize(
            patch_pos.astype(jnp.float32),
            nh,
            nw,
            a=-0.75,
            antialias=False,
            scale_h=(nh + 0.1) / s,
            scale_w=(nw + 0.1) / s,
        )
        return out.reshape(1, nh * nw, cfg.hidden_size)

    def __call__(
        self,
        x: jax.Array,
        do_resize: bool = True,
        interpolate_pos_encoding: Optional[bool] = None,
        do_rescale: bool = True,
        do_normalize: bool = True,
    ) -> jax.Array:
        """uint8 [B,H,W,C] or [B,C,H,W] images -> last hidden state tokens.

        Mirrors reference DeiT.forward (backbones.py:314-341): AutoProcessor
        preprocessing followed by the ViT encoder; here both are fused into
        the XLA program.
        """
        cfg = self.cfg
        spatial_ok = (x.ndim == 4) and (
            (x.shape[1] == cfg.image_size and x.shape[2] == cfg.image_size)
            or (x.shape[2] == cfg.image_size and x.shape[3] == cfg.image_size)
        )
        if self.fuse_preprocessing and do_resize and do_rescale and do_normalize and spatial_ok:
            tokens = self._fused_embed(x)
            b = tokens.shape[0]
            nh = nw = cfg.spatial
        else:
            x = preprocess_images(
                x,
                do_resize=do_resize,
                do_rescale=do_rescale,
                do_normalize=do_normalize,
                resize_size=cfg.resize_size,
                crop_size=cfg.crop_size,
                image_mean=cfg.image_mean,
                image_std=cfg.image_std,
                out_dtype=self.dtype,
            )
            b, h, w, _ = x.shape
            nh, nw = h // cfg.patch_size, w // cfg.patch_size
            tokens = self._patch_embed(x)  # [B, nh*nw, C]

        interp = bool(interpolate_pos_encoding) and (nh * nw != cfg.num_patches or nh != nw)
        if interp:
            patch_pos = self._interp_patch_pos(nh, nw)
        else:
            patch_pos = self.position_embeddings[:, 1:]

        if self.variant == "nocls":
            tokens = tokens + patch_pos.astype(self.dtype)
        elif self.variant == "cls":
            cls = jnp.broadcast_to(self.cls_token, (b, 1, cfg.hidden_size)).astype(self.dtype)
            tokens = jnp.concatenate([cls, tokens], axis=1)
            pos = jnp.concatenate([self.position_embeddings[:, :1], patch_pos], axis=1)
            tokens = tokens + pos.astype(self.dtype)
        elif self.variant == "reg":
            cls = jnp.broadcast_to(self.cls_token, (b, 1, cfg.hidden_size)).astype(self.dtype)
            reg = jnp.broadcast_to(
                self.reg_token, (b, self.num_reg_tokens, cfg.hidden_size)
            ).astype(self.dtype)
            tokens = jnp.concatenate([cls, tokens, reg], axis=1)
            pos = jnp.concatenate(
                [self.position_embeddings[:, :1], patch_pos, self.reg_pos_embed], axis=1
            )
            tokens = tokens + pos.astype(self.dtype)
        else:
            raise ValueError(f"unknown variant {self.variant}")

        t_real = tokens.shape[1]
        key_mask = None
        if TOKEN_PAD_MULTIPLE and t_real % TOKEN_PAD_MULTIPLE:
            t_pad = -(-t_real // TOKEN_PAD_MULTIPLE) * TOKEN_PAD_MULTIPLE
            tokens = jnp.pad(tokens, ((0, 0), (0, t_pad - t_real), (0, 0)))
            key_mask = jnp.where(
                jnp.arange(t_pad) < t_real, 0.0, -jnp.inf
            ).reshape(1, 1, 1, t_pad)

        for block in self.blocks:
            tokens = block(tokens, key_mask)
        if key_mask is not None:
            tokens = tokens[:, :t_real]
        return self.final_layernorm(tokens)


def build_backbone(
    model_name: str,
    pretrained: bool = False,
    image_size: int = 224,
    dtype: Any = jnp.float32,
    fuse_preprocessing: bool = False,
    fast_math: bool = False,
    **kwargs: Any,
) -> ViTBackbone:
    """Backbone factory dispatching on "reg"/"nocls"/"deit" substrings,
    mirroring reference build_backbone (backbones.py:506-526).

    ``pretrained`` weight loading is handled by the caller via
    theia_tpu.models.hf_convert (JAX is functional: modules are defs, weights
    are pytrees).
    """
    if model_name not in BACKBONE_CONFIGS:
        raise NotImplementedError(f"Requested {model_name} is not implemented.")
    cfg = dataclasses.replace(
        BACKBONE_CONFIGS[model_name], image_size=image_size, fast_math=fast_math
    )
    common = dict(dtype=dtype, fuse_preprocessing=fuse_preprocessing)
    if "reg" in model_name:
        num_reg = kwargs.pop("num_reg_tokens", 7)
        return ViTBackbone(cfg, variant="reg", num_reg_tokens=num_reg, **common)
    elif "nocls" in model_name:
        return ViTBackbone(cfg, variant="nocls", **common)
    elif "deit" in model_name:
        return ViTBackbone(cfg, variant="cls", **common)
    raise NotImplementedError(f"Requested {model_name} is not implemented.")
