from theia_tpu.models.vit import ViTBackboneConfig, ViTBackbone, build_backbone, BACKBONE_CONFIGS
from theia_tpu.models.utils import handle_feature_output
from theia_tpu.models.activations import get_activation_fn

__all__ = [
    "ViTBackboneConfig",
    "ViTBackbone",
    "build_backbone",
    "BACKBONE_CONFIGS",
    "handle_feature_output",
    "get_activation_fn",
]
