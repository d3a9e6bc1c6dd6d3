"""NN primitives (reference: layers.py:9-73).

Layout convention: activations are channel-last (B, T, C) — the natural TPU
layout — whereas the reference is channel-first. Public model APIs convert at
the boundary.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

_GAINS = {
    "linear": 1.0,
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": float(np.sqrt(2.0)),
}


def xavier_uniform(gain_name: str = "linear"):
    """torch-style ``xavier_uniform_`` with a named gain."""
    gain = _GAINS[gain_name]

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:  # dense: (in, out)
            fan_in, fan_out = shape[0], shape[1]
        else:  # conv kernel: (k, in, out)
            receptive = int(np.prod(shape[:-2]))
            fan_in, fan_out = shape[-2] * receptive, shape[-1] * receptive
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dropout(x, rate, key):
    """Inverted dropout driven by an explicit key — the one dropout
    implementation shared by the generator, discriminators, and classifier
    (the reference leans on torch's implicit-RNG F.dropout)."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class ConvNorm(nn.Module):
    """1-D conv with explicit symmetric padding (reference layers.py:22-40).

    Input/output are (B, T, C).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    gain: str = "linear"
    padding: int = -1  # -1 => "same" for odd kernels

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if pad == -1:
            assert self.kernel_size % 2 == 1
            pad = self.dilation * (self.kernel_size - 1) // 2
        return nn.Conv(self.features, (self.kernel_size,),
                       strides=(self.stride,), padding=[(pad, pad)],
                       kernel_dilation=(self.dilation,),
                       use_bias=self.use_bias,
                       kernel_init=xavier_uniform(self.gain),
                       name="conv")(x)


class BatchNorm(nn.Module):
    """BatchNorm over (B, T) per channel, torch defaults (momentum 0.1,
    eps 1e-5). ``use_running_average`` follows the train flag."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)
