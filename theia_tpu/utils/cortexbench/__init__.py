from theia_tpu.utils.cortexbench.load_model import load_model
from theia_tpu.utils.cortexbench.transforms import (
    r3m_transforms,
    rvfm_image_transforms,
    vit_transforms,
)
from theia_tpu.utils.cortexbench.policy_heads import ConvBatchNormMLP, ConvPolicyHead

__all__ = [
    "load_model",
    "rvfm_image_transforms",
    "vit_transforms",
    "r3m_transforms",
    "ConvBatchNormMLP",
    "ConvPolicyHead",
]
