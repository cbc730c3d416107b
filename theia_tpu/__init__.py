"""theia-tpu: TPU-native robot-vision foundation-model distillation framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference (bdaiinstitute/theia): distilling multiple vision
foundation models (CLIP, DINOv2, ViT, SAM, Depth-Anything) into one compact
ViT student for robot learning.

Public API mirrors the reference semantics (reference: src/theia/models/rvfm.py):
  - ``Theia`` (a.k.a. RobotVisionFM): ``forward_feature``, ``__call__`` ->
    dict[teacher, predicted feature], ``feature_reduce_method``.
  - distillation losses: MSE / SmoothL1 / cosine, main loss 0.9*cos + 0.1*l1.
"""

__version__ = "0.1.0"
