"""End-to-end GRADIENT parity: d(0.9*cos + 0.1*smoothL1)/d(params) through
backbone+translator matches the torch composition (HF ViT + reference
LightConv translator). This validates the whole training path, not just
forwards."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from reference_loader import load_reference
from theia_tpu.models import vit as jvit
from theia_tpu.models.hf_convert import convert_theia_checkpoint, state_dict_to_numpy
from theia_tpu.models.losses import get_loss, main_loss_from_terms
from theia_tpu.models.rvfm import Theia

rft = load_reference("models.feature_translators")

TARGETS = {"teacher/a": (24, 16, 16), "teacher/b": (12, 64, 64)}


def _torch_loss(pred, target):
    l1 = torch.nn.SmoothL1Loss()(pred, target)
    pn = F.normalize(pred.flatten(start_dim=1), dim=1, p=2)
    tn = F.normalize(target.flatten(start_dim=1), dim=1, p=2)
    cos = torch.nn.CosineEmbeddingLoss()(pn, tn, torch.ones(pred.size(0), dtype=torch.int))
    return cos, l1


def test_gradient_parity_full_model():
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(0)
    hf = ViTModel(
        ViTConfig(hidden_size=192, num_hidden_layers=2, num_attention_heads=3,
                  intermediate_size=768, image_size=224, patch_size=16),
        add_pooling_layer=False,
    )
    tr = rft.LightConvFeatureTranslator(
        backbone_feature_size=torch.Size((192, 14, 14)), target_feature_sizes=TARGETS
    )
    hf.train(False); tr.train(False)

    rng = np.random.RandomState(0)
    pix = rng.randn(2, 3, 224, 224).astype(np.float32) * 0.5
    tgt = {k: rng.randn(2, s[1] * s[2], s[0]).astype(np.float32) for k, s in TARGETS.items()}

    # ---- torch forward+backward ----
    tokens = hf(pixel_values=torch.from_numpy(pix)).last_hidden_state
    preds = tr(tokens, backbone_no_cls=False)
    cos_sum = l1_sum = 0.0
    n = len(preds)
    for k in preds:
        cos, l1 = _torch_loss(preds[k], torch.from_numpy(tgt[k]))
        cos_sum = cos_sum + cos / n
        l1_sum = l1_sum + l1 / n
    main = 0.9 * cos_sum + 0.1 * l1_sum
    main.backward()

    # ---- jax ----
    sd = {}
    for k, v in state_dict_to_numpy(hf.state_dict()).items():
        sd[f"backbone.model.{k}"] = v
    for k, v in state_dict_to_numpy(tr.state_dict()).items():
        sd[f"translator.{k}"] = v
    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        model = Theia(backbone=name, translator="lconv", target_feature_sizes=TARGETS)
        params = convert_theia_checkpoint(sd, num_layers=2, translator_type="lconv",
                                          target_feature_sizes=TARGETS)

        def loss_fn(p):
            out = model.apply(
                {"params": p}, jnp.asarray(pix),
                do_resize=False, do_rescale=False, do_normalize=False,
            )
            losses = get_loss(out, {k: jnp.asarray(v) for k, v in tgt.items()})
            return main_loss_from_terms(losses, "cos_l1")

        jloss, grads = jax.value_and_grad(loss_fn)(params)
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig

    np.testing.assert_allclose(float(jloss), float(main.detach()), rtol=1e-4)

    tgrad = {k: (v.grad.numpy() if v.grad is not None else None)
             for k, v in list(hf.named_parameters()) + list(tr.named_parameters())}

    def check(jax_grad, torch_name, transform=lambda x: x, atol=2e-5):
        want = transform(tgrad[torch_name])
        got = np.asarray(jax_grad)
        assert got.shape == want.shape, (torch_name, got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-8)
        np.testing.assert_allclose(got, want, atol=max(atol, 1e-3 * scale), err_msg=torch_name)

    bb = grads["backbone_module"]
    check(bb["cls_token"], "embeddings.cls_token")
    check(bb["position_embeddings"], "embeddings.position_embeddings")
    check(
        bb["patch_kernel"], "embeddings.patch_embeddings.projection.weight",
        lambda w: w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]),
    )
    check(bb["block_0"]["query"]["kernel"], "encoder.layer.0.attention.attention.query.weight", lambda w: w.T)
    check(bb["block_1"]["output"]["kernel"], "encoder.layer.1.output.dense.weight", lambda w: w.T)
    check(bb["layernorm"]["scale"], "layernorm.weight")

    trg = grads["translator_module"]
    check(trg["head_teacher_a"]["adapter_8"]["kernel"], "translator_heads.teacher/a.adapter.8.weight", lambda w: w.T)
    check(trg["head_teacher_a"]["adapter_0"]["weight"], "translator_heads.teacher/a.adapter.0.weight")
    check(
        trg["head_teacher_b"]["adapter_4"]["kernel"],  # deconv ladder for 64-target
        "translator_heads.teacher/b.adapter.4.weight",
        lambda w: w.transpose(2, 3, 0, 1),
    )
    check(
        trg["head_teacher_b"]["pad"]["pad_1"]["kernel"], "translator_heads.teacher/b.pad.1.weight",
        lambda w: w.transpose(2, 3, 0, 1),
    )
