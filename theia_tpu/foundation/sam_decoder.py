"""SAM prompt encoder + two-way-transformer mask decoder (JAX port).

Together with theia_tpu.foundation.sam (the vision encoder) this completes
the SAM stack needed by the decoding layer: the reference injects predicted
(B,256,64,64) embeddings into the HF mask-generation pipeline
(reference: src/theia/decoding/sam.py:15-106, injection at :80-85). Here the
mask decoder is a native flax module and the auto-mask pipeline lives in
theia_tpu.decoding.sam.

Numerics match HF SamModel's prompt_encoder / mask_decoder /
shared_image_embedding (state-dict convertible via convert_sam_decoder).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SamDecoderConfig:
    hidden_size: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    num_mask_tokens: int = 4  # 1 + num_multimask_outputs(3)
    num_layers: int = 2
    attention_downsample_rate: int = 2
    iou_head_hidden_dim: int = 256
    iou_head_depth: int = 3
    image_embedding_size: int = 64
    input_image_size: int = 1024
    num_pos_feats: int = 128
    layer_norm_eps: float = 1e-6


SAM_DECODER = SamDecoderConfig()


def positional_encode(coords: jax.Array, pe_matrix: jax.Array) -> jax.Array:
    """SamPositionalEmbedding.forward for [0,1]-normalized coords [..., 2]."""
    c = 2.0 * coords - 1.0
    c = c @ pe_matrix
    c = 2.0 * math.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def image_wide_positional_embedding(pe_matrix: jax.Array, size: int) -> jax.Array:
    """SamModel.get_image_wide_positional_embeddings -> [1, C, size, size]."""
    grid = np.ones((size, size), np.float32)
    y = (grid.cumsum(0) - 0.5) / size
    x = (grid.cumsum(1) - 0.5) / size
    pe = positional_encode(jnp.asarray(np.stack([x, y], -1)), pe_matrix)  # (h, w, C)
    return jnp.transpose(pe, (2, 0, 1))[None]


class _SamAttention(nn.Module):
    cfg: SamDecoderConfig
    downsample_rate: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value):
        """query/key/value: [B, P, T, C]."""
        cfg = self.cfg
        internal = cfg.hidden_size // self.downsample_rate
        nh = cfg.num_heads
        hd = internal // nh
        dense = lambda feats, name: nn.Dense(feats, name=name, dtype=self.dtype, param_dtype=jnp.float32)
        q = dense(internal, "q_proj")(query)
        k = dense(internal, "k_proj")(key)
        v = dense(internal, "v_proj")(value)
        b, p, tq, _ = q.shape
        tk = k.shape[2]
        qh = q.reshape(b * p, tq, nh, hd)
        kh = k.reshape(b * p, tk, nh, hd)
        vh = v.reshape(b * p, tk, nh, hd)
        scores = jnp.einsum("bqhc,bkhc->bhqk", qh, kh, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores / math.sqrt(hd), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhc->bqhc", probs, vh).reshape(b, p, tq, internal)
        return dense(cfg.hidden_size, "out_proj")(out)


class _TwoWayBlock(nn.Module):
    cfg: SamDecoderConfig
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name, dtype=self.dtype, param_dtype=jnp.float32)
        if self.skip_first_layer_pe:
            queries = _SamAttention(cfg, 1, dtype=self.dtype, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _SamAttention(cfg, 1, dtype=self.dtype, name="self_attn")(q, q, queries)
        queries = ln("layer_norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _SamAttention(
            cfg, cfg.attention_downsample_rate, dtype=self.dtype, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = ln("layer_norm2")(queries)

        h = nn.Dense(cfg.mlp_dim, name="mlp_lin1", dtype=self.dtype, param_dtype=jnp.float32)(queries)
        h = jax.nn.relu(h)
        h = nn.Dense(cfg.hidden_size, name="mlp_lin2", dtype=self.dtype, param_dtype=jnp.float32)(h)
        queries = ln("layer_norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _SamAttention(
            cfg, cfg.attention_downsample_rate, dtype=self.dtype, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = ln("layer_norm4")(keys)
        return queries, keys


class SamMaskDecoder(nn.Module):
    """Prompt encoding (points/boxes) + mask prediction, matching HF SamModel
    semantics for the no-mask-input path."""

    cfg: SamDecoderConfig = SAM_DECODER
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.cfg
        c = cfg.hidden_size
        init = nn.initializers.normal(1.0)
        self.pe_matrix = self.param("positional_embedding", init, (2, cfg.num_pos_feats))
        self.point_embed = self.param("point_embed", nn.initializers.normal(0.02), (4, c))
        self.not_a_point_embed = self.param("not_a_point_embed", nn.initializers.normal(0.02), (1, c))
        self.no_mask_embed = self.param("no_mask_embed", nn.initializers.normal(0.02), (1, c))
        self.iou_token = self.param("iou_token", nn.initializers.normal(0.02), (1, c))
        self.mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02), (cfg.num_mask_tokens, c))
        self.blocks = [
            _TwoWayBlock(cfg, skip_first_layer_pe=(i == 0), dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.num_layers)
        ]
        self.final_attn = _SamAttention(
            cfg, cfg.attention_downsample_rate, dtype=self.dtype, name="final_attn_token_to_image"
        )
        self.final_ln = nn.LayerNorm(epsilon=1e-5, name="layer_norm_final_attn", dtype=self.dtype, param_dtype=jnp.float32)
        self.upscale_conv1 = self.param("upscale_conv1", nn.initializers.normal(0.02), (2, 2, c, c // 4))
        self.upscale_conv1_bias = self.param("upscale_conv1_bias", nn.initializers.zeros, (c // 4,))
        self.upscale_conv2 = self.param("upscale_conv2", nn.initializers.normal(0.02), (2, 2, c // 4, c // 8))
        self.upscale_conv2_bias = self.param("upscale_conv2_bias", nn.initializers.zeros, (c // 8,))
        self.upscale_ln = self.param("upscale_ln", nn.initializers.ones, (c // 4,))
        self.upscale_ln_bias = self.param("upscale_ln_bias", nn.initializers.zeros, (c // 4,))
        self.hyper_mlps = [
            [
                nn.Dense(c, name=f"hyper_{i}_in", dtype=self.dtype, param_dtype=jnp.float32),
                nn.Dense(c, name=f"hyper_{i}_mid", dtype=self.dtype, param_dtype=jnp.float32),
                nn.Dense(c // 8, name=f"hyper_{i}_out", dtype=self.dtype, param_dtype=jnp.float32),
            ]
            for i in range(cfg.num_mask_tokens)
        ]
        self.iou_head = [
            nn.Dense(cfg.iou_head_hidden_dim, name="iou_in", dtype=self.dtype, param_dtype=jnp.float32),
            nn.Dense(cfg.iou_head_hidden_dim, name="iou_mid", dtype=self.dtype, param_dtype=jnp.float32),
            nn.Dense(cfg.num_mask_tokens, name="iou_out", dtype=self.dtype, param_dtype=jnp.float32),
        ]

    def embed_points(self, points: jax.Array, labels: jax.Array, pad: bool = True) -> jax.Array:
        """points [B, P, N, 2] in input-image pixel coords, labels [B, P, N]."""
        cfg = self.cfg
        points = points + 0.5
        if pad:
            b, p, n, _ = points.shape
            points = jnp.concatenate([points, jnp.zeros((b, p, 1, 2), points.dtype)], axis=2)
            labels = jnp.concatenate([labels, -jnp.ones((b, p, 1), labels.dtype)], axis=2)
        coords = points / cfg.input_image_size
        emb = positional_encode(coords, self.pe_matrix)
        emb = jnp.where(labels[..., None] == -1, self.not_a_point_embed[0], emb)
        emb = jnp.where((labels == 0)[..., None], emb + self.point_embed[0], emb)
        emb = jnp.where((labels == 1)[..., None], emb + self.point_embed[1], emb)
        return emb

    def __call__(
        self,
        image_embeddings: jax.Array,  # [B, 64, 64, 256] NHWC
        input_points: jax.Array,      # [B, P, N, 2]
        input_labels: jax.Array,      # [B, P, N]
        multimask_output: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (low_res_masks [B, P, M, 256, 256], iou_pred [B, P, M])."""
        cfg = self.cfg
        b, h, w, c = image_embeddings.shape
        p = input_points.shape[1]

        sparse = self.embed_points(input_points, input_labels)
        dense = self.no_mask_embed.reshape(1, 1, 1, c)
        img = (image_embeddings + dense).astype(self.dtype)

        img_pe = image_wide_positional_embedding(self.pe_matrix, cfg.image_embedding_size)
        img_pe = jnp.transpose(img_pe, (0, 2, 3, 1))  # NHWC

        out_tokens = jnp.concatenate([self.iou_token, self.mask_tokens], axis=0)
        tokens = jnp.broadcast_to(out_tokens[None, None], (b, p, out_tokens.shape[0], c))
        tokens = jnp.concatenate([tokens, sparse.astype(self.dtype)], axis=2)

        keys = img.reshape(b, 1, h * w, c)
        keys = jnp.broadcast_to(keys, (b, p, h * w, c))
        key_pe = img_pe.reshape(1, 1, h * w, c)
        key_pe = jnp.broadcast_to(key_pe, (b, p, h * w, c)).astype(self.dtype)
        queries = tokens

        for block in self.blocks:
            queries, keys = block(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + self.final_attn(q, k, keys)
        queries = self.final_ln(queries)

        iou_out = queries[:, :, 0]
        mask_tokens_out = queries[:, :, 1 : 1 + cfg.num_mask_tokens]

        img_out = keys.reshape(b * p, h, w, c)
        from theia_tpu.ops.convt import conv_transpose_2d

        up = conv_transpose_2d(img_out, self.upscale_conv1.astype(self.dtype), stride=2) + self.upscale_conv1_bias
        # channels-last SamLayerNorm over C
        mean = jnp.mean(up.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(up.astype(jnp.float32) - mean), axis=-1, keepdims=True)
        up = ((up - mean) / jnp.sqrt(var + cfg.layer_norm_eps)) * self.upscale_ln + self.upscale_ln_bias
        up = jax.nn.gelu(up.astype(self.dtype), approximate=False)
        up = conv_transpose_2d(up, self.upscale_conv2.astype(self.dtype), stride=2) + self.upscale_conv2_bias
        up = jax.nn.gelu(up, approximate=False)  # [B*P, 4h, 4w, c//8]

        hyper = []
        for i in range(cfg.num_mask_tokens):
            t = mask_tokens_out[:, :, i]
            lin_in, lin_mid, lin_out = self.hyper_mlps[i]
            t = jax.nn.relu(lin_in(t))
            t = jax.nn.relu(lin_mid(t))
            hyper.append(lin_out(t))
        hyper_in = jnp.stack(hyper, axis=2)  # [B, P, M, c//8]

        uh, uw = up.shape[1], up.shape[2]
        up = up.reshape(b, p, uh * uw, -1)
        masks = jnp.einsum("bpmc,bpsc->bpms", hyper_in, up).reshape(b, p, -1, uh, uw)

        iou = jax.nn.relu(self.iou_head[0](iou_out))
        iou = jax.nn.relu(self.iou_head[1](iou))
        iou = self.iou_head[2](iou)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, :, sl], iou[:, :, sl]


def convert_sam_decoder(sd: dict[str, np.ndarray], cfg: SamDecoderConfig = SAM_DECODER) -> dict:
    """HF SamModel state dict (incl. buffers) -> SamMaskDecoder params."""

    def d(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def l(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params: dict[str, Any] = {
        "positional_embedding": sd["shared_image_embedding.positional_embedding"],
        "point_embed": np.concatenate(
            [sd[f"prompt_encoder.point_embed.{i}.weight"] for i in range(4)], axis=0
        ),
        "not_a_point_embed": sd["prompt_encoder.not_a_point_embed.weight"],
        "no_mask_embed": sd["prompt_encoder.no_mask_embed.weight"],
        "iou_token": sd["mask_decoder.iou_token.weight"],
        "mask_tokens": sd["mask_decoder.mask_tokens.weight"],
        "upscale_conv1": sd["mask_decoder.upscale_conv1.weight"].transpose(2, 3, 0, 1),
        "upscale_conv1_bias": sd["mask_decoder.upscale_conv1.bias"],
        "upscale_conv2": sd["mask_decoder.upscale_conv2.weight"].transpose(2, 3, 0, 1),
        "upscale_conv2_bias": sd["mask_decoder.upscale_conv2.bias"],
        "upscale_ln": sd["mask_decoder.upscale_layer_norm.weight"],
        "upscale_ln_bias": sd["mask_decoder.upscale_layer_norm.bias"],
        "final_attn_token_to_image": {
            k: d(f"mask_decoder.transformer.final_attn_token_to_image.{k}")
            for k in ("q_proj", "k_proj", "v_proj", "out_proj")
        },
        "layer_norm_final_attn": l("mask_decoder.transformer.layer_norm_final_attn"),
        "iou_in": d("mask_decoder.iou_prediction_head.proj_in"),
        "iou_mid": d("mask_decoder.iou_prediction_head.layers.0"),
        "iou_out": d("mask_decoder.iou_prediction_head.proj_out"),
    }
    for i in range(cfg.num_mask_tokens):
        hp = f"mask_decoder.output_hypernetworks_mlps.{i}"
        params[f"hyper_{i}_in"] = d(f"{hp}.proj_in")
        params[f"hyper_{i}_mid"] = d(f"{hp}.layers.0")
        params[f"hyper_{i}_out"] = d(f"{hp}.proj_out")
    for i in range(cfg.num_layers):
        lp = f"mask_decoder.transformer.layers.{i}"
        layer: dict[str, Any] = {}
        for attn in ("self_attn", "cross_attn_token_to_image", "cross_attn_image_to_token"):
            layer[attn] = {k: d(f"{lp}.{attn}.{k}") for k in ("q_proj", "k_proj", "v_proj", "out_proj")}
        for j in range(1, 5):
            layer[f"layer_norm{j}"] = l(f"{lp}.layer_norm{j}")
        layer["mlp_lin1"] = d(f"{lp}.mlp.lin1")
        layer["mlp_lin2"] = d(f"{lp}.mlp.lin2")
        params[f"layer_{i}"] = layer
    return params
