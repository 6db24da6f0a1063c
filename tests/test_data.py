"""Input pipeline tests: prefetch + batching (TPU-native addition)."""

import numpy as np
import jax

from dau_convnet_tpu.data import epoch_batches, prefetch_to_device
from dau_convnet_tpu.parallel import batch_sharding, make_mesh


def test_epoch_batches_cover_all():
    x = np.arange(100).reshape(100, 1)
    y = np.arange(100)
    seen = []
    for bx, by in epoch_batches(x, y, 32, rng=np.random.default_rng(0)):
        assert bx.shape == (32, 1)
        np.testing.assert_array_equal(bx[:, 0], by)
        seen.extend(by.tolist())
    assert len(seen) == 96 and len(set(seen)) == 96  # drop_remainder


def test_prefetch_to_device_values_and_order():
    batches = [(np.full((2, 2), i, np.float32), np.array([i])) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, (bx, by) in enumerate(out):
        assert isinstance(bx, jax.Array)
        assert float(bx[0, 0]) == i and int(by[0]) == i


def test_prefetch_with_sharding():
    mesh = make_mesh(jax.devices()[:8], model=1)
    sh = batch_sharding(mesh)
    batches = [(np.ones((8, 3), np.float32),) for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), sharding=(sh,)))
    assert out[0][0].sharding.spec[0] == "data"


def test_prefetch_propagates_errors():
    import pytest

    def gen():
        yield (np.zeros(1),)
        raise RuntimeError("boom")

    it = prefetch_to_device(gen())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
