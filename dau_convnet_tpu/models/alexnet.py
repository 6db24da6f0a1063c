"""AlexNet-DAU: the reference's headline benchmark network.

The reference distributes three Caffe-trained AlexNet variants where the
conv2-conv5 layers are DAU layers (README.md:29-35):

- AlexNet-DAU-ConvNet-small: 0.3M DAU units (56.4% ImageNet top-1)
- AlexNet-DAU-ConvNet (default): 0.7M units (56.9%)
- AlexNet-DAU-ConvNet-large: 1.5M units (57.3%)

The unit budget is sum(S*G*F) over DAU layers; with AlexNet channel widths
(96-256-384-384-256) that is 0.37M / 0.74M / 1.48M units for G = 1 / 2 / 4
units per (s, f) pair - matching the three published budgets. conv1 stays a
standard strided convolution (stride-4 11x11 stem; DAU layers are stride-1
aggregation layers).
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import DAUConv2d

__all__ = ["AlexNetDAU", "ALEXNET_DAU_VARIANTS"]

# variant name -> dau_units per layer (G = prod(units))
ALEXNET_DAU_VARIANTS = {
    "small": (1, 1),    # ~0.37M units
    "default": (2, 1),  # ~0.74M units
    "large": (2, 2),    # ~1.48M units
}


def _max_pool_nchw(x, window=3, stride=2):
    y = jnp.transpose(x, (0, 2, 3, 1))
    y = nn.max_pool(y, (window, window), strides=(stride, stride))
    return jnp.transpose(y, (0, 3, 1, 2))


class AlexNetDAU(nn.Module):
    """AlexNet with DAU conv2-conv5. Input NCHW (N, 3, 224, 224)."""

    num_classes: int = 1000
    variant: str = "default"
    max_kernel_size: int = 9
    # optional kernel-tier promise for all DAU layers (|mu| bound); pair with
    # utils.tiers.tier_for_params for the between-epochs re-jit workflow
    static_max_offset: tp.Optional[float] = None
    engine: str = "auto"
    fused_bwd: str = "auto"
    fused_dx: str = "auto"
    fused_gather: str = "phi"
    # serving: cache the fourier phase tables as a 'phi_cache' collection
    # (see nn.DAUConv2d.phi_caching; inference-only)
    phi_caching: bool = False
    train: bool = True
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: tp.Optional[bool] = None):
        train = self.train if train is None else train
        units = ALEXNET_DAU_VARIANTS[self.variant]

        # conv1 stem: standard strided conv (NHWC for flax Conv)
        y = jnp.transpose(x, (0, 2, 3, 1))
        y = nn.Conv(96, (11, 11), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        x = jnp.transpose(y, (0, 3, 1, 2))
        x = _max_pool_nchw(x)

        for name, filters, pool in (("dau_conv2", 256, True),
                                    ("dau_conv3", 384, False),
                                    ("dau_conv4", 384, False),
                                    ("dau_conv5", 256, True)):
            x = DAUConv2d(filters=filters, dau_units=units,
                          max_kernel_size=self.max_kernel_size,
                          static_max_offset=self.static_max_offset,
                          engine=self.engine,
                          fused_bwd=self.fused_bwd, fused_dx=self.fused_dx,
                          fused_gather=self.fused_gather,
                          phi_caching=self.phi_caching,
                          activation=nn.relu, dtype=self.dtype,
                          name=name)(x)
            if pool:
                x = _max_pool_nchw(x)

        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc8")(x)

    def num_dau_units(self, in_channels=(96, 256, 384, 384)) -> int:
        g = int(jnp.prod(jnp.asarray(ALEXNET_DAU_VARIANTS[self.variant])))
        outs = (256, 384, 384, 256)
        return sum(s * g * f for s, f in zip(in_channels, outs))
