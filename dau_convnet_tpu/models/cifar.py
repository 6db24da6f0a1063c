"""3-layer DAU ConvNet for CIFAR-10.

The reference README's canonical usage example (README.md:236-280): three
dau_conv2d layers (96/96/192 filters, 2x2 units, k=9, mu_learning_rate 500)
with batch norm (NCHW axis=1), 2x2 max pooling, and a final fully-connected
classifier. The full CIFAR-10 training setup lives in the external
skokec/DAU-ConvNet-cifar10-example repo; this module is the in-framework
equivalent.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import dau_conv2d

__all__ = ["DAUCifarNet", "ConvCifarNet"]


def _max_pool_nchw(x, window=2, stride=2):
    y = jnp.transpose(x, (0, 2, 3, 1))
    y = nn.max_pool(y, (window, window), strides=(stride, stride))
    return jnp.transpose(y, (0, 3, 1, 2))


class DAUCifarNet(nn.Module):
    """dau_conv1(96) -> pool -> dau_conv2(96) -> pool -> dau_conv3(192)
    -> pool -> fc(num_classes). Input NCHW (N, 3, 32, 32)."""

    num_classes: int = 10
    train: bool = True
    dau_units: tp.Tuple[int, int] = (2, 2)
    max_kernel_size: int = 9
    static_max_offset: tp.Optional[float] = None
    mu_learning_rate_factor: float = 500.0
    # The reference example's batch-norm momentum (README.md:252) sized for
    # ImageNet-scale step counts: its EMA horizon is ~1/(1-m) = 10k steps.
    # Short runs MUST lower it or eval-mode collapses: DAU params never
    # settle (mu grads are amplified x500), so the layer output statistics
    # keep drifting and a 10k-step-stale running estimate ends up ~80x off
    # the live batch variance (measured: docs/TRAINING_RESULTS.md).
    bn_momentum: float = 0.9999
    # learn the layer-shared sigma (off by default, like the reference's
    # dau_sigma_trainable, dau_conv.py:254); the op clips a trainable
    # sigma into [0.3, blur-filter support] so it cannot silently truncate
    dau_sigma_trainable: bool = False
    # 'auto' resolves per precision (DAUConvSettings); explicit 'fourier'
    # is ~an order of magnitude fewer FLOPs at these shapes (useful for
    # CPU-bound runs), oracle-exact at f32/highest
    engine: str = "auto"
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: tp.Optional[bool] = None):
        train = self.train if train is None else train

        def norm(v):
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=0.001, axis=1, dtype=self.dtype)(v)

        for i, filters in enumerate((96, 96, 192)):
            x = dau_conv2d(
                x, filters, dau_units=self.dau_units,
                max_kernel_size=self.max_kernel_size,
                static_max_offset=self.static_max_offset,
                mu_learning_rate_factor=self.mu_learning_rate_factor,
                dau_sigma_trainable=self.dau_sigma_trainable,
                engine=self.engine,
                normalizer_fn=norm, biases_initializer=None,
                weights_initializer=nn.initializers.xavier_normal(),
                name=f"dau_conv{i + 1}", dtype=self.dtype)
            x = _max_pool_nchw(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc4")(x)


class ConvCifarNet(nn.Module):
    """Plain-conv control for `DAUCifarNet`: identical topology with 3x3
    convolutions in place of the DAU layers (the sanity baseline the
    round-2 verdict asks to train alongside the DAU net - the reference's
    own experiments compare DAU nets against equivalent conv nets,
    reference README.md:24-38)."""

    num_classes: int = 10
    train: bool = True
    bn_momentum: float = 0.9999  # see DAUCifarNet.bn_momentum
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: tp.Optional[bool] = None):
        train = self.train if train is None else train
        for i, filters in enumerate((96, 96, 192)):
            y = jnp.transpose(x, (0, 2, 3, 1))
            y = nn.Conv(filters, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i + 1}")(y)
            x = jnp.transpose(y, (0, 3, 1, 2))
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=0.001, axis=1, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = _max_pool_nchw(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc4")(x)
