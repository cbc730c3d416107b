"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The container's sitecustomize registers the axon TPU backend and exports
JAX_PLATFORMS=axon, so an explicit jax.config.update is required — env vars
alone don't stick.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# keep HF/transformers fully offline in tests
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r4 #7): the full suite exceeds 10 min on a 1-core host,
# so "run the tests" as a pre-commit gate needs a tier that finishes fast.
#   pytest -m quick        — <60 s smoke, one test per subsystem
#   pytest -m "not slow"   — everything but torch-parity / multiprocess
# Markers are assigned here by nodeid so test files stay unannotated.
# ---------------------------------------------------------------------------

import pytest

# one (cheap) test per subsystem — keep this tier under a minute total
QUICK_NODEIDS = (
    "test_config.py::test_group_swap_and_value_overrides",        # config system
    "test_losses.py::test_get_loss_aggregation_matches_reference_math",  # losses
    "test_train_step.py::test_freeze_translator",                 # train step
    "test_data.py::test_end_to_end_dataset_and_loader",           # data pipeline
    "test_adapters.py::test_transforms_match_reference_semantics",  # cortexbench
    "test_serving.py::test_bucketed_matches_direct",              # serving
    "test_export.py::test_artifact_round_trip",                   # AOT export
    "test_hub.py::test_parse_model_name",                         # hub names
    "test_decoding.py::test_decode_dinov2_shapes_and_range",      # decoding
    "test_tensor_parallel.py::test_validate_tp_rejects_indivisible",  # parallelism
    "test_ops.py::test_conv_transpose_adjoint_vjp_matches_autodiff",  # TPU ops
)

# whole files that are torch-parity, multiprocess, or minutes-long
SLOW_FILES = {
    "test_multihost.py",
    "test_multihost_grid.py",
    "test_multichip_dryrun_grid.py",
    "test_preemption.py",
    "test_teachers.py",
    "test_depth_anything.py",
    "test_reference_golden.py",
    "test_sam.py",
    "test_sam_amg.py",
    "test_sam_decoder.py",
    "test_all_variants_train.py",
    "test_oxe_train_loop.py",
    "test_train_loop.py",
    "test_grad_parity.py",
    "test_translator_parity.py",
    "test_vit_parity.py",
    "test_video_pipeline.py",
    "test_extraction.py",
    "test_fused_preprocessing.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        short = item.nodeid.split("/")[-1]
        if any(short == q or short.startswith(q + "[") for q in QUICK_NODEIDS):
            item.add_marker(pytest.mark.quick)
        if short.split("::")[0] in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
