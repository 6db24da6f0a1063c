"""Train the 3-layer DAU ConvNet on CIFAR-10 (or synthetic data).

In-framework equivalent of the reference's external example repo
(skokec/DAU-ConvNet-cifar10-example, linked from README.md:234): the
3-layer dau_conv2d network with batch norm, trained with SGD + momentum.

This environment has no dataset egress, so by default the script runs on a
synthetic CIFAR-shaped dataset (`--synthetic`, random images with
linearly-separable-ish labels) to demonstrate the full training loop; point
`--data-dir` at a CIFAR-10 npz (keys: x_train [N,32,32,3] uint8, y_train)
to train on the real thing.

Usage:
    python examples/train_cifar10.py --steps 200 --batch 128
"""

from __future__ import annotations

import argparse
import math
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from dau_convnet_tpu.models import DAUCifarNet
from dau_convnet_tpu.utils.math import validate_dau_params
from dau_convnet_tpu.utils.tiers import max_offset_in_tree, snap_kernel_tier


def check_dau_health(params, kernel_size: int):
    """Host-side runtime guards between jit steps: the live equivalent of the
    reference's per-step NaN/offset-bound checks (dau_conv_op.cpp:258-262,
    dau_conv_forward.cpp:156-158). Raises ValueError on divergence."""
    for lname, lparams in params.items():
        if isinstance(lparams, dict) and "mu1" in lparams:
            validate_dau_params(
                lparams["weights"], lparams["mu1"], lparams["mu2"],
                lparams["sigma"], kernel_size=kernel_size)


def synthetic_cifar(n=2048, num_classes=10, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, (n,))
    # class-dependent means make the task learnable
    means = rng.normal(0, 0.5, (num_classes, 3, 1, 1)).astype(np.float32)
    x = rng.normal(0, 1.0, (n, 3, 32, 32)).astype(np.float32) + means[y]
    return x, y.astype(np.int32)


def load_data(args):
    if args.data_dir:
        d = np.load(args.data_dir)
        x = (d["x_train"].astype(np.float32) / 255.0 - 0.5).transpose(0, 3, 1, 2)
        return x, d["y_train"].astype(np.int32)
    return synthetic_cifar()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--synthetic", action="store_true", default=True)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--check-every", type=int, default=100,
                    help="host-side param guard + kernel-tier check interval")
    ap.add_argument("--auto-tier", action="store_true",
                    help="pick static_max_offset from live offsets and re-jit "
                         "when the tier grows (the reference's dynamic "
                         "kernel-size optimization, dau_conv_op.cpp:223-256)")
    args = ap.parse_args()

    x_all, y_all = load_data(args)
    net = DAUCifarNet(train=True)

    rng = jax.random.PRNGKey(0)
    sample = jnp.asarray(x_all[:args.batch])
    variables = jax.jit(net.init)(rng, sample)

    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(variables["params"])

    if args.auto_tier:
        # trace-time tier from the live offsets (+0.5 slack so small drifts
        # don't force a re-jit at every check)
        off = min(math.ceil(max_offset_in_tree(variables["params"]) + 0.5),
                  net.max_kernel_size // 2)
        net = net.clone(static_max_offset=float(off))
        print(f"auto-tier: static_max_offset={off} "
              f"(tier {snap_kernel_tier(off)})")

    def make_train_step(net):
        @jax.jit
        def train_step(params, batch_stats, opt_state, x, y):
            def loss_fn(p):
                logits, updates = net.apply(
                    {"params": p, "batch_stats": batch_stats}, x,
                    mutable=["batch_stats"])
                loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
                acc = (logits.argmax(-1) == y).mean()
                return loss, (updates["batch_stats"], acc)

            (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), bs, opt_state, loss, acc
        return train_step

    train_step = make_train_step(net)

    from dau_convnet_tpu.data import epoch_batches, prefetch_to_device

    params, batch_stats = variables["params"], variables["batch_stats"]
    data_rng = np.random.default_rng(1)
    t0 = time.time()
    step = 0
    while step < args.steps:
        batches = epoch_batches(x_all, y_all, args.batch, rng=data_rng)
        for x, y in prefetch_to_device(batches, size=2):
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state, x, y)
            if step % 20 == 0 or step == args.steps - 1:
                print(f"step {step:4d}  loss {float(loss):.4f}  "
                      f"acc {float(acc):.3f}  ({(time.time() - t0):.1f}s)",
                      flush=True)
            step += 1
            if args.check_every and step % args.check_every == 0:
                # runtime guards on concrete params, between jit steps
                check_dau_health(params, net.max_kernel_size)
                if args.auto_tier:
                    live = max_offset_in_tree(params)
                    if live > net.static_max_offset:
                        off = min(math.ceil(live + 0.5),
                                  net.max_kernel_size // 2)
                        print(f"offsets grew to {live:.2f}: re-jit with "
                              f"static_max_offset={off}")
                        net = net.clone(static_max_offset=float(off))
                        train_step = make_train_step(net)
            if step >= args.steps:
                break

    if args.ckpt_dir:
        from dau_convnet_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(args.ckpt_dir, args.steps,
                        {"params": params, "batch_stats": batch_stats})
        print(f"saved checkpoint to {args.ckpt_dir}")


if __name__ == "__main__":
    main()
