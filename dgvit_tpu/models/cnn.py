"""CNN trunk shared by the convolutional actor/critic variants.

Reference: three Conv2d(k5, stride 2) layers 16/64/256 + ReLU +
AdaptiveAvgPool2d(1,1) (got_sac_network.py:40-47,90-94,129-135,263-266,333-336).
Implemented NHWC (TPU conv layout); inputs arriving as (B, H, W) get a
trailing channel axis, (B, C, H, W) torch layouts are transposed by callers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgvit_tpu.models import initializers as init


class TorchConv(nn.Module):
    """VALID conv with torch Conv2d default init."""

    features: int
    kernel: int = 5
    stride: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        import jax

        cin = x.shape[-1]
        k = self.param("kernel", init.torch_conv_kernel(),
                       (self.kernel, self.kernel, cin, self.features))
        b = self.param("bias", init.torch_conv_bias(self.kernel * self.kernel * cin),
                       (self.features,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


class ConvTrunk(nn.Module):
    """conv(5,s2)->relu x3 -> global average pool -> (B, 256)."""

    features: Sequence[int] = (16, 64, 256)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            x = x[..., None]
        for i, f in enumerate(self.features):
            x = TorchConv(f, dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
