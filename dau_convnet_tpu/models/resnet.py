"""DAU-ResNet: residual networks with DAU aggregation layers.

An extension beyond the reference repo (which ships only AlexNet-DAU and
the 3-layer CIFAR example): basic residual blocks whose 3x3 convolutions
are replaced by DAU layers - the drop-in-replacement usage pattern the
reference advertises (`dau_conv2d` replacing `tf.contrib.layers.conv2d`,
reference README.md:37-39) applied to a modern backbone.

Downsampling uses strided 1x1 convs on the shortcut and the DAU layer's
stride emulation (output slicing, reference behavior) on the main path.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import DAUConv2d

__all__ = ["DAUResNet", "RESNET_DAU_DEPTHS"]

# depth name -> blocks per stage
RESNET_DAU_DEPTHS = {
    "18": (2, 2, 2, 2),
    "34": (3, 4, 6, 3),
}


class DAUBasicBlock(nn.Module):
    filters: int
    dau_units: tp.Tuple[int, int] = (2, 2)
    max_kernel_size: int = 9
    strides: int = 1
    train: bool = True
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def norm(v, name):
            return nn.BatchNorm(use_running_average=not self.train,
                                momentum=0.9, axis=1, dtype=self.dtype,
                                name=name)(v)

        residual = x
        y = DAUConv2d(filters=self.filters, dau_units=self.dau_units,
                      max_kernel_size=self.max_kernel_size,
                      strides=self.strides, use_bias=False,
                      dtype=self.dtype, name="dau1")(x)
        y = nn.relu(norm(y, "bn1"))
        y = DAUConv2d(filters=self.filters, dau_units=self.dau_units,
                      max_kernel_size=self.max_kernel_size,
                      use_bias=False, dtype=self.dtype, name="dau2")(y)
        y = norm(y, "bn2")

        if residual.shape[1] != self.filters or self.strides > 1:
            r = jnp.transpose(residual, (0, 2, 3, 1))
            r = nn.Conv(self.filters, (1, 1), strides=(self.strides,) * 2,
                        use_bias=False, dtype=self.dtype, name="proj")(r)
            residual = jnp.transpose(r, (0, 3, 1, 2))
            residual = norm(residual, "bn_proj")
        return nn.relu(y + residual)


class DAUResNet(nn.Module):
    """ResNet-{18,34} with DAU basic blocks. Input NCHW."""

    num_classes: int = 1000
    depth: str = "18"
    width: int = 64
    dau_units: tp.Tuple[int, int] = (2, 2)
    max_kernel_size: int = 9
    train: bool = True
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: tp.Optional[bool] = None):
        train = self.train if train is None else train
        stages = RESNET_DAU_DEPTHS[self.depth]

        y = jnp.transpose(x, (0, 2, 3, 1))
        y = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="stem")(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        x = jnp.transpose(y, (0, 3, 1, 2))
        x = nn.relu(nn.BatchNorm(use_running_average=not train, axis=1,
                                 dtype=self.dtype, name="bn_stem")(x))

        for stage, blocks in enumerate(stages):
            filters = self.width * (2 ** stage)
            for b in range(blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                x = DAUBasicBlock(filters=filters, dau_units=self.dau_units,
                                  max_kernel_size=self.max_kernel_size,
                                  strides=strides, train=train,
                                  dtype=self.dtype,
                                  name=f"stage{stage}_block{b}")(x)

        x = jnp.mean(x, axis=(2, 3))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
