"""PyTorch-compatible 2D transposed convolution in NHWC for TPU.

The reference's adapter ladders rely on exact torch ConvTranspose2d output
shapes — e.g. 16->31 (k=3,s=2,p=1) then 31->64 (k=3,s=2,output_padding=1)
(reference: src/theia/models/adapter_heads.py:304-315) and the 14->16 pad
deconv (k=3,s=1) (adapter_heads.py:279-289). We reproduce
    out = (in - 1)*stride - 2*padding + kernel + output_padding
via lax.conv_general_dilated with input (lhs) dilation, which XLA lowers to
MXU-friendly convolutions on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv_transpose_2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    preferred_element_type: jnp.dtype | None = None,
) -> jax.Array:
    """Transposed conv with torch semantics.

    Args:
        x: NHWC input.
        kernel: HWIO layout, (kh, kw, in_ch, out_ch) — i.e. the torch weight
            (in_ch, out_ch, kh, kw) transposed to (2, 3, 0, 1). Spatial flip is
            applied here.
        stride/padding/output_padding: torch ConvTranspose2d params.

    Returns:
        NHWC output of spatial size (in-1)*stride - 2*padding + k + output_padding.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    # transposed conv == conv over input dilated by `stride`, with the kernel
    # spatially flipped, pad (k-1-p) low / (k-1-p+output_padding) high.
    kernel = kernel[::-1, ::-1, :, :]
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )
