import numpy as np, jax, jax.numpy as jnp
from dau_convnet_tpu.kernels import aggregate_forward_pallas, dau_forward_fused_pallas, grad_tables_pallas
from dau_convnet_tpu.ops import xla_engine
from dau_convnet_tpu.ops.gaussian import gaussian_filters

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)
S, G, F, N, H, W, ks = 128, 2, 32, 4, 16, 16, 9
w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, jnp.float32)
mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
xb = jnp.asarray(rng.random((N, S, H, W)), jnp.float32)

y_pl = jax.jit(lambda *a: aggregate_forward_pallas(*a, ks, interpret=False))(xb, w, mu1, mu2)
y_xla = jax.jit(lambda *a: xla_engine.aggregate_forward(*a, ks))(xb, w, mu1, mu2)
d = float(jnp.max(jnp.abs(y_pl - y_xla)))
print("aggregate pallas-vs-xla maxdiff:", d, flush=True)
assert d < 1e-3

filt = gaussian_filters(jnp.float32(0.5), size=9)["w"]
x = jnp.asarray(rng.random((N, S, H, W)), jnp.float32)
y_f = jax.jit(lambda *a: dau_forward_fused_pallas(*a, filt, ks, interpret=False))(x, w, mu1, mu2)
from dau_convnet_tpu.ops.gaussian import depthwise_blur
y_ref = jax.jit(lambda *a: xla_engine.aggregate_forward(depthwise_blur(a[0], filt), *a[1:], ks))(x, w, mu1, mu2)
d = float(jnp.max(jnp.abs(y_f - y_ref)))
print("fused pallas-vs-xla maxdiff:", d, flush=True)
assert d < 1e-3

M = 3
xbk = jnp.asarray(rng.random((M, N, S, H, W)), jnp.float32)
err = jnp.asarray(rng.standard_normal((N, F, H, W)), jnp.float32)
t_pl = jax.jit(lambda *a: grad_tables_pallas(*a, ks, interpret=False))(xbk, err)
t_xla = jax.jit(lambda *a: xla_engine.grad_tables(*a, ks))(xbk, err)
d = float(jnp.max(jnp.abs(t_pl - t_xla)))
print("grad_tables pallas-vs-xla maxdiff:", d, flush=True)
assert d < 2e-2  # large sums, fp32 accumulation-order differences
print("ALL PALLAS TPU CHECKS PASS")
