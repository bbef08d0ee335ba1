"""Initializers matching the reference's PyTorch initialization exactly,
so from-scratch training is distributionally equivalent (SURVEY.md §7 hard
part (b)).

Reference behavior:
  * every nn.Linear weight gets Xavier-uniform gain 1 via `weights_init_`
    (got_sac_network.py:30-33, applied recursively by `self.apply`)
  * nn.Linear bias keeps the torch default U(-1/sqrt(fan_in), +1/sqrt(fan_in))
    (the constant_(bias, 0) line is commented out, got_sac_network.py:33)
  * nn.Conv2d keeps torch defaults: kaiming_uniform(a=sqrt(5)) for the kernel —
    which reduces to U(+-1/sqrt(fan_in)), fan_in = in_ch*kh*kw — and the same
    bound for bias
  * GoT pos_embedding / cls_token are standard-normal (GoalFormer.py:142-143)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform()


def torch_linear_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_conv_kernel():
    """Torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
    Flax conv kernels are (kh, kw, in, out): fan_in = kh*kw*in."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, _ = shape
        bound = 1.0 / np.sqrt(kh * kw * cin)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_conv_bias(fan_in: int):
    return torch_linear_bias(fan_in)


normal = nn.initializers.normal(stddev=1.0)  # torch.randn for pos embeddings
