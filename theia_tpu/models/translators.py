"""Feature translators: shared stem + per-teacher adapter heads.

Re-design of the reference translators (reference:
src/theia/models/feature_translators.py): flow is
backbone_adapter -> translator_stem -> translator_heads (:12-88). Four types:
  - "mlp"  (:91-122): LN+Linear adapter, MLPAdapterHead per teacher.
  - "conv" (:125-156): LN+Linear adapter, ConvAdapterHead per teacher.
  - "lconv"(:159-205, production): adapter is Identity (:183); heads are
    LightConvAdapterHead, or LinearAdapterHead for `<teacher>_cls` targets.
  - "transformer" (:208-290): TransformerDecoder stem with learned decode
    tokens + per-teacher embedding, MLP heads.

Teacher names are sanitized for the param tree ("/" and "." -> "_"),
mirroring the reference's "."->"_" ModuleDict map (:46).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from theia_tpu.models.adapter_heads import (
    ConvAdapterHead,
    LightConvAdapterHead,
    LinearAdapterHead,
    MLPAdapterHead,
)
from theia_tpu.models.layers import DenseTorch, LayerNormTorch

Size = tuple[int, ...]


def legit_name(target_model: str) -> str:
    """Param-tree-safe teacher name."""
    return target_model.replace(".", "_").replace("/", "_")


class _BackboneAdapter(nn.Module):
    """LN(C) + Linear(C -> hidden) pre-adapter (reference :49-55)."""

    in_features: int
    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = LayerNormTorch(self.in_features, dtype=self.dtype, name="adapter_0")(x)
        return DenseTorch(self.hidden_size, self.in_features, dtype=self.dtype, name="adapter_1")(x)


class MLPFeatureTranslator(nn.Module):
    """(reference :91-122)"""

    backbone_feature_size: Size  # (C, H, W)
    target_feature_sizes: dict[str, Size]
    translator_hidden_size: int = 1024
    translator_n_layer: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        target_model_names: Optional[list[str]] = None,
        backbone_no_cls: bool = False,
    ) -> dict[str, jax.Array]:
        x = _BackboneAdapter(
            self.backbone_feature_size[0],
            self.translator_hidden_size,
            dtype=self.dtype,
            name="backbone_adapter",
        )(x)
        names = target_model_names if target_model_names is not None else list(self.target_feature_sizes)
        source = (self.translator_hidden_size, *self.backbone_feature_size[1:])
        out = {}
        for t in names:
            out[t] = MLPAdapterHead(
                source,
                self.target_feature_sizes[t],
                num_layer=self.translator_n_layer,
                dtype=self.dtype,
                name=f"head_{legit_name(t)}",
            )(x, backbone_no_cls=backbone_no_cls)
        return out


class ConvFeatureTranslator(nn.Module):
    """(reference :125-156)"""

    backbone_feature_size: Size
    target_feature_sizes: dict[str, Size]
    translator_hidden_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        target_model_names: Optional[list[str]] = None,
        backbone_no_cls: bool = False,
    ) -> dict[str, jax.Array]:
        x = _BackboneAdapter(
            self.backbone_feature_size[0],
            self.translator_hidden_size,
            dtype=self.dtype,
            name="backbone_adapter",
        )(x)
        names = target_model_names if target_model_names is not None else list(self.target_feature_sizes)
        source = (self.translator_hidden_size, *self.backbone_feature_size[1:])
        out = {}
        for t in names:
            out[t] = ConvAdapterHead(
                source,
                self.target_feature_sizes[t],
                dtype=self.dtype,
                name=f"head_{legit_name(t)}",
            )(x, backbone_no_cls=backbone_no_cls)
        return out


# Rematerialization of the LightConv heads: save conv/dense outputs and LN
# stats, recompute the elementwise relu/LN-normalize in the backward pass —
# trades recompute reads for not storing the big normalized maps.
HEAD_REMAT = False


def _maybe_remat(head_cls):
    if not HEAD_REMAT:
        return head_cls
    policy = jax.checkpoint_policies.save_only_these_names("conv_out", "ln_stats")
    return nn.remat(head_cls, policy=policy, static_argnums=(2,))


class LightConvFeatureTranslator(nn.Module):
    """Production translator: no pre-adapter, light conv heads
    (reference :159-205, backbone_adapter replaced by Identity at :183)."""

    backbone_feature_size: Size
    target_feature_sizes: dict[str, Size]
    translator_hidden_size: int = 1024  # unused; kept for config parity
    hidden_size_factor: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        target_model_names: Optional[list[str]] = None,
        backbone_no_cls: bool = False,
    ) -> dict[str, jax.Array]:
        names = target_model_names if target_model_names is not None else list(self.target_feature_sizes)
        out = {}
        for t in names:
            if "_cls" in t:
                out[t] = LinearAdapterHead(
                    self.backbone_feature_size,
                    self.target_feature_sizes[t],
                    dtype=self.dtype,
                    name=f"head_{legit_name(t)}",
                )(x, backbone_no_cls=backbone_no_cls)
            else:
                out[t] = _maybe_remat(LightConvAdapterHead)(
                    self.backbone_feature_size,
                    self.target_feature_sizes[t],
                    hidden_size_factor=self.hidden_size_factor,
                    dtype=self.dtype,
                    name=f"head_{legit_name(t)}",
                )(x, backbone_no_cls)
        return out


class _MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention with packed in_proj (for weight parity)."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        e = self.embed_dim
        nh = self.num_heads
        hd = e // nh
        w_in = self.param(
            "in_proj_weight",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -math.sqrt(1.0 / e), math.sqrt(1.0 / e)
            ),
            (3 * e, e),
        )
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        wq, wk, wv = w_in[:e], w_in[e : 2 * e], w_in[2 * e :]
        bq, bk, bv = b_in[:e], b_in[e : 2 * e], b_in[2 * e :]
        b, tq, _ = q.shape
        tk = k.shape[1]
        qh = (q @ wq.T.astype(self.dtype) + bq).reshape(b, tq, nh, hd)
        kh = (k @ wk.T.astype(self.dtype) + bk).reshape(b, tk, nh, hd)
        vh = (v @ wv.T.astype(self.dtype) + bv).reshape(b, tk, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores / math.sqrt(hd), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, tq, e)
        return DenseTorch(e, e, dtype=self.dtype, name="out_proj")(ctx)


class _TransformerDecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer(norm_first=True, batch_first=True)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: jax.Array, memory: jax.Array) -> jax.Array:
        x = tgt
        h = LayerNormTorch(self.d_model, dtype=self.dtype, name="norm1")(x)
        x = x + _MultiheadAttention(self.d_model, self.nhead, dtype=self.dtype, name="self_attn")(h, h, h)
        h = LayerNormTorch(self.d_model, dtype=self.dtype, name="norm2")(x)
        x = x + _MultiheadAttention(self.d_model, self.nhead, dtype=self.dtype, name="multihead_attn")(h, memory, memory)
        h = LayerNormTorch(self.d_model, dtype=self.dtype, name="norm3")(x)
        h = DenseTorch(self.dim_feedforward, self.d_model, dtype=self.dtype, name="linear1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = DenseTorch(self.d_model, self.dim_feedforward, dtype=self.dtype, name="linear2")(h)
        return x + h


class TransformerFeatureTranslator(nn.Module):
    """TransformerDecoder stem with learned decode tokens (reference :208-290).

    Divergence from the reference: heads are called with the CLS already
    dropped; the reference re-drops the first stem output token via the
    heads' default backbone_no_cls=False (:289), which crashes for any
    spatial-size-changing head — we keep all 196 decode outputs instead.
    """

    backbone_feature_size: Size
    target_feature_sizes: dict[str, Size]
    translator_hidden_size: int = 1024
    translator_n_layers: int = 2
    translator_n_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        target_model_names: Optional[list[str]] = None,
        backbone_no_cls: bool = False,
    ) -> dict[str, jax.Array]:
        if not backbone_no_cls:
            x = x[:, 1:]
        x = _BackboneAdapter(
            self.backbone_feature_size[0],
            self.translator_hidden_size,
            dtype=self.dtype,
            name="backbone_adapter",
        )(x)
        n_tokens = int(self.backbone_feature_size[1] * self.backbone_feature_size[2])
        decode_tokens = self.param(
            "decode_tokens",
            nn.initializers.normal(1.0),
            (1, n_tokens, self.translator_hidden_size),
        )
        names = target_model_names if target_model_names is not None else list(self.target_feature_sizes)
        layers = [
            _TransformerDecoderLayer(
                self.translator_hidden_size,
                self.translator_n_heads,
                self.translator_hidden_size * 2,
                dtype=self.dtype,
                name=f"stem_layer_{i}",
            )
            for i in range(self.translator_n_layers)
        ]
        b = x.shape[0]
        out = {}
        for t in names:
            emb = self.param(
                f"target_model_emb_{legit_name(t)}",
                nn.initializers.normal(1.0),
                (1, 1, self.translator_hidden_size),
            )
            tgt = jnp.concatenate(
                [
                    jnp.broadcast_to(decode_tokens, (b, n_tokens, self.translator_hidden_size)),
                    jnp.broadcast_to(emb, (b, 1, self.translator_hidden_size)),
                ],
                axis=1,
            ).astype(self.dtype)
            h = tgt
            for layer in layers:
                h = layer(h, x)
            h = h[:, 1:]  # 196 tokens (reference :288)
            out[t] = MLPAdapterHead(
                (self.translator_hidden_size, *self.backbone_feature_size[1:]),
                self.target_feature_sizes[t],
                num_layer=2,
                dtype=self.dtype,
                name=f"head_{legit_name(t)}",
            )(h, backbone_no_cls=True)
        return out


def build_feature_translator(translator_type: str, **kwargs: Any) -> nn.Module:
    """Factory mirroring reference build_feature_translator (:293-313)."""
    kwargs.pop("hidden_size", None)  # mlp config alias, unused (configs/model/translator/mlp.yaml)
    if translator_type == "mlp":
        return MLPFeatureTranslator(**kwargs)
    elif translator_type == "conv":
        return ConvFeatureTranslator(**kwargs)
    elif translator_type == "lconv":
        return LightConvFeatureTranslator(**kwargs)
    elif translator_type in ("transformer", "trans"):
        kwargs.pop("translator_activation", None)
        return TransformerFeatureTranslator(**kwargs)
    raise NotImplementedError(f"Requested {translator_type} is not implemented yet.")
