"""Model zoo tests: CIFAR DAU net and AlexNet-DAU."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from dau_convnet_tpu.models import ALEXNET_DAU_VARIANTS, AlexNetDAU, DAUCifarNet


def test_cifar_net_forward_and_train_step():
    net = DAUCifarNet(train=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (2,)))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables

    # mu grads carry the x500 mu_learning_rate_factor; keep the test LR small
    tx = optax.sgd(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt_state, x, y):
        def loss_fn(params):
            logits, updates = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, updates
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        upd, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(variables["params"], upd)
        return {"params": params, "batch_stats": updates["batch_stats"]}, opt_state, loss

    losses = []
    for _ in range(3):
        variables, opt_state, loss = step(variables, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_alexnet_unit_budgets_match_published():
    # reference README.md:33-35: 0.3M / 0.7M / 1.5M DAU units
    budgets = {v: AlexNetDAU(variant=v).num_dau_units()
               for v in ALEXNET_DAU_VARIANTS}
    assert budgets["small"] == 368_640
    assert budgets["default"] == 737_280
    assert budgets["large"] == 1_474_560


def test_alexnet_forward_shape():
    model = AlexNetDAU(variant="small", train=False, num_classes=17)
    x = jnp.ones((1, 3, 127, 127), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 17)
    # DAU layers present with the expected param shapes
    p = params["params"]
    assert p["dau_conv2"]["weights"].shape == (1, 96, 2, 256)
    assert p["dau_conv2"]["sigma"].shape == (1,)


def test_dau_resnet_forward_and_train_smoke():
    from dau_convnet_tpu.models import DAUResNet

    model = DAUResNet(depth="18", width=8, num_classes=5, train=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 3, 64, 64)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (2,)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    logits, _ = jax.jit(
        lambda v, x: model.apply(v, x, mutable=["batch_stats"]))(variables, x)
    assert logits.shape == (2, 5)

    tx = optax.sgd(1e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt_state, x, y):
        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, mutable=["batch_stats"])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), updates
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        upd, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(variables["params"], upd)
        return ({"params": params, "batch_stats": updates["batch_stats"]},
                opt_state, loss)

    losses = []
    for _ in range(3):
        variables, opt_state, loss = step(variables, opt_state, x, y)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
