"""Verify parity against the PUBLISHED theaiinstitute hub checkpoints.

The reference's primary user flow is
``AutoModel.from_pretrained("theaiinstitute/theia-<size>-patch16-224-<set>",
trust_remote_code=True)`` (reference: README.md:23-38). The golden-fixture
suite proves <1e-3 parity for the *architecture* (reference modules executed
from source with locally generated weights); this runbook closes the gap to
the *shipped artifact*: it fetches the real published weights, converts them
with :mod:`theia_tpu.models.hf_convert`, and asserts <1e-3 feature MSE on a
fixed image set — then stores a small activation fixture so the assertion
becomes a regular offline test (tests/test_reference_golden.py::
test_published_fixture_parity).

This container has zero egress, so the download leg cannot run here; the
runbook is: on any networked machine with this repo + torch + jax(cpu)

    python -m theia_tpu.scripts.verify_published \
        --model theaiinstitute/theia-tiny-patch16-224-cdiv
    git add tests/fixtures/published_*.npz   # ~1 MB, fp16 activations

Steps performed:
  1. download ``model.safetensors`` (fallback ``pytorch_model.bin``) from
     the hub — or use ``--checkpoint`` for a local copy;
  2. run OUR model on a fixed seeded uint8 image set via
     ``theia_tpu.models.hub.from_pretrained`` (name parsing + hf_convert);
  3. if the reference source tree or the hub's trust_remote_code module is
     importable, run the SAME weights through the reference RobotVisionFM
     in torch and record its outputs;
  4. assert feature/pred MSE < 1e-3 between the two, print a report, and
     write ``tests/fixtures/published_<size>_<set>.npz`` holding the
     images-seed, the torch outputs (fp16) and our outputs (fp16) so the
     offline test re-checks the stored pair (and, with ``--store-params``,
     the converted param tree for full recomputation offline).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

IMAGE_SEED = 7
N_IMAGES = 4
TOL_MSE = 1e-3


def fixed_images(n: int = N_IMAGES) -> np.ndarray:
    """The fixed evaluation image set (seeded; identical in the offline test)."""
    return np.random.RandomState(IMAGE_SEED).randint(
        0, 256, size=(n, 224, 224, 3), dtype=np.uint8
    )


def fixture_name(model_name: str) -> str:
    # theaiinstitute/theia-tiny-patch16-224-cdiv -> published_tiny_cdiv.npz
    tail = model_name.rsplit("/", 1)[-1]
    parts = tail.split("-")
    size = parts[1] if len(parts) > 1 else "tiny"
    tset = parts[-1] if parts[-1] not in ("224",) else "cdiv"
    return f"published_{size}_{tset}.npz"


def fetch_checkpoint(model_name: str) -> str:
    from huggingface_hub import hf_hub_download

    try:
        return hf_hub_download(model_name, "model.safetensors")
    except Exception:
        return hf_hub_download(model_name, "pytorch_model.bin")


def run_ours(model_name: str, checkpoint_path: str, images: np.ndarray):
    from theia_tpu.models.hub import from_pretrained

    model = from_pretrained(model_name, checkpoint_path)
    feat = np.asarray(model.forward_feature(images), np.float32)
    preds = {k: np.asarray(v, np.float32) for k, v in model(images).items()}
    return model, feat, preds


def run_reference_torch(model_name: str, checkpoint_path: str, images: np.ndarray):
    """Run the published weights through the reference RobotVisionFM.

    Tries, in order: (a) the hub's own trust_remote_code module (what the
    reference README tells users to run), (b) the reference source tree
    executed offline via tests/golden_reference.py with the downloaded
    state dict loaded strict=False (reference rvfm.py:77-87 semantics).
    Returns (feature, preds) as float32 numpy, or None if neither is
    available in this environment.
    """
    import torch

    x = torch.from_numpy(images)

    try:  # (a) the published remote-code path
        from transformers import AutoModel

        model = AutoModel.from_pretrained(model_name, trust_remote_code=True)
        model.eval()
        with torch.no_grad():
            feat = model.forward_feature(x)
            preds = model(x)
        return feat.numpy().astype(np.float32), {
            k: v.numpy().astype(np.float32) for k, v in preds.items()
        }
    except Exception as e:
        print(f"[verify_published] remote-code reference unavailable: {e}")

    try:  # (b) reference source tree + downloaded state dict
        repo_tests = Path(__file__).resolve().parents[2] / "tests"
        sys.path.insert(0, str(repo_tests))
        import golden_reference as gr
        from theia_tpu.models.hub import parse_model_name

        backbone, teachers = parse_model_name(model_name)
        from theia_tpu.foundation.common import get_model_feature_size

        sizes = {t: get_model_feature_size(t, keep_spatial=True) for t in teachers}
        cfg = gr.GoldenConfig(backbone=backbone, translator="lconv", sizes=sizes)
        gr.CONFIGS["_published"] = cfg
        model = gr.build_reference_rvfm("_published")

        if checkpoint_path.endswith(".safetensors"):
            from safetensors.torch import load_file

            sd = load_file(checkpoint_path)
        else:
            sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        missing, unexpected = model.load_state_dict(sd, strict=False)
        if missing or unexpected:
            print(f"[verify_published] strict=False load: missing={missing[:4]}... "
                  f"unexpected={unexpected[:4]}...")
        model.eval()
        with torch.no_grad():
            feat = model.forward_feature(x)
            preds = model(x)
        return feat.numpy().astype(np.float32), {
            k: v.numpy().astype(np.float32) for k, v in preds.items()
        }
    except Exception as e:
        print(f"[verify_published] reference-source run unavailable: {e}")
    return None


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="theaiinstitute/theia-tiny-patch16-224-cdiv")
    ap.add_argument("--checkpoint", default=None, help="local .safetensors/.pth copy")
    ap.add_argument(
        "--fixture-dir",
        default=str(Path(__file__).resolve().parents[2] / "tests" / "fixtures"),
    )
    ap.add_argument(
        "--store-params",
        action="store_true",
        help="also store the converted param tree (adds ~20-50 MB; lets the "
        "offline test recompute our outputs instead of trusting stored ones)",
    )
    args = ap.parse_args()

    ckpt = args.checkpoint or fetch_checkpoint(args.model)
    images = fixed_images()

    ours_model, our_feat, our_preds = run_ours(args.model, ckpt, images)
    ref = run_reference_torch(args.model, ckpt, images)

    out: dict[str, np.ndarray] = {
        "images": images,
        "model_name": np.asarray(args.model),
        "ours::forward_feature": our_feat.astype(np.float16),
    }
    for k, v in our_preds.items():
        out[f"ours::pred::{k}"] = v.astype(np.float16)

    report = {"model": args.model, "checkpoint": ckpt, "reference_ran": ref is not None}
    ok = True
    if ref is not None:
        ref_feat, ref_preds = ref
        out["ref::forward_feature"] = ref_feat.astype(np.float16)
        mse = float(np.mean((our_feat - ref_feat) ** 2))
        report["forward_feature_mse"] = mse
        ok &= mse < TOL_MSE
        for k, v in ref_preds.items():
            out[f"ref::pred::{k}"] = v.astype(np.float16)
            m = float(np.mean((our_preds[k] - v) ** 2))
            report[f"pred_mse::{k}"] = m
            ok &= m < TOL_MSE
    if args.store_params:
        import jax

        flat = jax.tree_util.tree_flatten_with_path(ours_model.params)[0]
        for path, leaf in flat:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            out[f"param::{key}"] = np.asarray(leaf, np.float16)

    fx = Path(args.fixture_dir) / fixture_name(args.model)
    np.savez_compressed(fx, **out)
    report["fixture"] = str(fx)
    report["parity_ok"] = bool(ok) if ref is not None else None
    print(json.dumps(report, indent=2))
    if ref is not None and not ok:
        raise SystemExit(f"published-weight parity FAILED (> {TOL_MSE} MSE): {report}")


if __name__ == "__main__":
    main()
