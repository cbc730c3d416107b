from theia_tpu.ops.image import (
    bicubic_resize,
    center_crop,
    interpolate_bilinear,
    preprocess_images,
)
from theia_tpu.ops.convt import conv_transpose_2d
from theia_tpu.ops.init import (
    torch_conv_init,
    torch_conv_transpose_init,
    torch_linear_init,
    torch_linear_bias_init,
    trunc_normal_init,
)

__all__ = [
    "bicubic_resize",
    "center_crop",
    "interpolate_bilinear",
    "preprocess_images",
    "conv_transpose_2d",
    "torch_conv_init",
    "torch_conv_transpose_init",
    "torch_linear_init",
    "torch_linear_bias_init",
    "trunc_normal_init",
]
