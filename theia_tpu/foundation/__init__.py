from theia_tpu.foundation.common import (
    MODELS,
    MODEL_FEATURE_SIZES,
    get_max_model_spatial_size,
    get_model_feature_size,
)

__all__ = [
    "MODELS",
    "MODEL_FEATURE_SIZES",
    "get_model_feature_size",
    "get_max_model_spatial_size",
]
