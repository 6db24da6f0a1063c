"""Flax layer API mirroring the reference TensorFlow plugin's Python surface.

Reference: plugins/tensorflow/dau_conv/dau_conv.py -
`DAUConv2d` (:221-555), `DAUConv1d` (:557-570), `DAUGridMean` (:24-74),
`ZeroNLast` (:76-110), and the contrib-style `dau_conv2d` / `dau_conv1d`
wrappers (:579-795). Parameter names, shapes ([1, S, G, F]), defaults and
behavioral quirks (unit rounding to groups of 2, stride emulation by output
slicing, layer-level mu clipping, single shared non-trainable sigma) are
kept; TF Session-era plumbing (collections, variable_scope, regularizer
hooks) maps to idiomatic flax/optax (regularizers are applied by the loss,
constraints by the optimizer).

Improvements over the reference where free on TPU: NHWC is supported in
addition to NCHW (the reference is NCHW-only, dau_conv.py:163-181), and any
number of output channels is allowed (no multiple-of-16/32 restriction -
that was a CUDA warp-layout constraint, README.md:225).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dau_conv import DAUConvSettings, dau_conv2d_op
from ..ops.gaussian import blur_kernel_size

__all__ = ["DAUGridMean", "ZeroNLast", "DAUConv2d", "DAUConv1d",
           "dau_conv2d", "dau_conv1d", "set_dau_variables_manually",
           "project_dau_params", "refresh_phi_cache", "DAU_UNITS_GROUP"]


def refresh_phi_cache(model, variables, sample_input):
    """Recompute every `phi_caching` layer's cached phase table from the
    CURRENT params (serving: call once after loading/updating weights).

    Runs one forward with the 'phi_cache' collection mutable and returns
    the variables pytree with the refreshed cache installed. `sample_input`
    must have the serving spatial shape and dtype (the table is built for
    them).
    """
    variables = dict(variables)
    if "phi_cache" not in variables:
        # first build: init-style apply materializes the collection
        variables.setdefault("phi_cache", {})
    _, upd = model.apply(variables, sample_input, mutable=["phi_cache"])
    variables["phi_cache"] = upd["phi_cache"]
    return variables


def project_dau_params(params, *, kernel_size: int,
                       component_border_bound: float = 0.01,
                       sigma_lower_bound: float = 0.3,
                       sigma_upper_bound: float = 1.6):
    """Project DAU params back into their valid ranges after an optimizer
    update - the functional equivalent of the reference's in-place bounds
    guard (base_dau_conv_layer.cu:33-49), which clips the param STORAGE
    every forward so boundary gradients keep flowing. (The layers also
    clip in-graph, which bounds the EFFECTIVE values but freezes a raw
    param that momentum carried past a bound - with trainable sigma, run
    this on the params after each update.) Clips leaves named 'sigma'
    into [sigma_lower_bound, sigma_upper_bound] and 'mu1'/'mu2' into
    +-(kernel_size//2 - component_border_bound). jit-safe.
    """
    import jax

    bound = kernel_size // 2 - component_border_bound

    def fix(path, v):
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "sigma":
            return jnp.clip(v, sigma_lower_bound, sigma_upper_bound)
        if name in ("mu1", "mu2"):
            return jnp.clip(v, -bound, bound)
        return v

    return jax.tree_util.tree_map_with_path(fix, params)

# the engine aggregates units in groups of 2; odd unit counts get one dummy
# unit with zero weight and no gradient (reference dau_conv.py:223-224,
# :313-329). Kept for layout/checkpoint parity with the reference.
DAU_UNITS_GROUP = 2


def DAUGridMean(dau_units, max_value, dau_unit_axis=2):
    """Initializer spreading DAU means on a regular grid in [-max, +max].

    Reference dau_conv.py:24-74. For the requested shape [1, S, G, F] with
    G = prod(dau_units) (+ dummy pad), positions vary along unit axis
    `dau_unit_axis` of the separated [S, units0, units1, F] view (2 => mu1,
    1 => mu2) and broadcast along all other axes.
    """
    u0, u1 = dau_units

    def init(key, shape, dtype=jnp.float32):
        del key
        if len(shape) != 4:
            raise ValueError(
                "DAUGridMean requires rank-4 shape [1, S, units, F]")
        _, s, g, f = shape
        sep = (u0, u1) if g == u0 * u1 else None
        if sep is None:
            # dummy-padded unit count: spread over the flat G axis instead
            n = g
            vals = (np.arange(n) * (2 * max_value + 1) / float(n)
                    + (-0.5 + (2 * max_value + 1) / float(2 * n)) - max_value)
            out = np.broadcast_to(vals[None, None, :, None], (1, s, g, f))
            return jnp.asarray(out, dtype)
        n = (u0, u1)[dau_unit_axis - 1]
        vals = (np.arange(n) * (2 * max_value + 1) / float(n)
                + (-0.5 + (2 * max_value + 1) / float(2 * n)) - max_value)
        grid = np.zeros((1, s, u0, u1, f))
        if dau_unit_axis == 2:
            grid += vals[None, None, None, :, None]
        elif dau_unit_axis == 1:
            grid += vals[None, None, :, None, None]
        else:
            raise ValueError("dau_unit_axis must be 1 (mu2) or 2 (mu1)")
        return jnp.asarray(grid.reshape(1, s, g, f), dtype)

    return init


def ZeroNLast(base_init, last_num_to_zero, axis):
    """Wrap an initializer, zeroing the last N entries along `axis`
    (reference dau_conv.py:76-110; used to blank dummy units' weights)."""

    def init(key, shape, dtype=jnp.float32):
        vals = base_init(key, shape, dtype)
        if last_num_to_zero == 0:
            return vals
        idx = jnp.arange(shape[axis]) < (shape[axis] - last_num_to_zero)
        bshape = [1] * len(shape)
        bshape[axis] = shape[axis]
        return vals * idx.reshape(bshape).astype(dtype)

    return init


def set_dau_variables_manually(variables, layer_path: str, *,
                               weights=None, mu1=None, mu2=None,
                               sigma=None, bias=None):
    """Load custom/pretrained DAU parameters into a flax variables pytree.

    Parity with the reference `DAUConv2d.set_dau_variables_manually`
    (plugins/tensorflow/dau_conv/dau_conv.py:344-359), which replaces the
    layer's TF variables with user-supplied tensors. Flax parameters are
    external state, so this returns a NEW pytree with the named layer's
    entries replaced (the input is not mutated).

    Args:
      variables: pytree from `model.init` - either the full
        ``{"params": {...}}`` dict or the inner params dict.
      layer_path: the layer's name, or a '/'-separated path for nested
        modules (e.g. ``"block1/dau_conv2"``); ``""`` when the DAUConv2d
        module itself was init'ed (params at the root).
      weights, mu1, mu2, sigma, bias: arrays to install (any subset).
        Shapes must match the existing parameters exactly
        (``DAUConv2d.dau_param_shape``); ``sigma`` additionally accepts a
        bare scalar (the layer stores the single shared sigma as shape
        ``(1,)``, reference dau_conv.py:417-430). Values are cast to the
        existing parameter dtype.

    Returns: a pytree of the same structure with the new values installed.
    """
    try:  # FrozenDict (older flax) -> plain nested dicts
        from flax.core import unfreeze
        root = unfreeze(variables)
    except Exception:
        root = variables

    def _copy(d):
        return {k: (_copy(v) if isinstance(v, dict) else v) for k, v in d.items()}

    root = _copy(dict(root))
    node = root["params"] if "params" in root and isinstance(root["params"], dict) else root
    path = [p for p in layer_path.split("/") if p]
    for p in path:
        if not isinstance(node, dict) or p not in node:
            raise KeyError(
                f"layer path {layer_path!r} not found (missing {p!r}); "
                f"available: {sorted(node) if isinstance(node, dict) else node}")
        node = node[p]

    updates = {"weights": weights, "mu1": mu1, "mu2": mu2,
               "sigma": sigma, "bias": bias}
    for name, value in updates.items():
        if value is None:
            continue
        if name not in node:
            raise KeyError(
                f"layer {layer_path!r} has no parameter {name!r} "
                f"(has {sorted(node)})")
        old = node[name]
        new = jnp.asarray(value, dtype=old.dtype)
        if name == "sigma" and new.ndim == 0:
            new = new.reshape(old.shape)
        if new.shape != old.shape:
            raise ValueError(
                f"{layer_path}/{name}: shape {new.shape} != expected "
                f"{old.shape} (DAU params are [1, S, G, F]; sigma is (1,))")
        node[name] = new
    return root


def _rounded_units(dau_units: tp.Tuple[int, int]):
    """Round the unit count up to a multiple of DAU_UNITS_GROUP, growing the
    smaller grid axis (reference dau_conv.py:313-329). Returns
    (dau_units, num_all, num_ignore)."""
    units = tuple(int(u) for u in dau_units)
    num_all = int(np.prod(units))
    num_ignore = 0
    if num_all % DAU_UNITS_GROUP != 0:
        new_num = int(math.ceil(num_all / DAU_UNITS_GROUP) * DAU_UNITS_GROUP)
        num_ignore = new_num - num_all
        if units[0] < units[1]:
            units = (units[0] + num_ignore, units[1])
        else:
            units = (units[0], units[1] + num_ignore)
        num_all = new_num
    return units, num_all, num_ignore


class DAUConv2d(nn.Module):
    """Displaced Aggregation Unit 2D convolution layer.

    Drop-in analogue of the reference `DAUConv2d` (dau_conv.py:221-555);
    constructor argument names and defaults match the reference README
    (README.md:150-190). Input is NCHW for data_format='channels_first'
    (reference behavior) or NHWC for 'channels_last' (extension).

    Parameters (flax): weights/mu1/mu2 of shape [1, S, G, F], sigma of
    shape [1] (single shared Gaussian width, tiled internally; trainable
    only when `dau_sigma_trainable` - reference dau_conv.py:417-430), and
    bias [F].

    To load custom/pretrained DAU parameters (the reference's
    `set_dau_variables_manually`, dau_conv.py:344-359), use the module-level
    `set_dau_variables_manually(variables, layer_name, ...)` helper on the
    initialized params pytree.
    """

    filters: int
    dau_units: tp.Tuple[int, int]
    max_kernel_size: int
    strides: int = 1
    data_format: str = "channels_first"
    activation: tp.Optional[tp.Callable] = None
    use_bias: bool = True
    weight_initializer: tp.Callable = nn.initializers.normal(stddev=0.1)
    mu1_initializer: tp.Optional[tp.Callable] = None
    mu2_initializer: tp.Optional[tp.Callable] = None
    sigma_initializer: tp.Optional[tp.Callable] = None
    bias_initializer: tp.Callable = nn.initializers.zeros
    # constraints are applied to the parameter value before use (reference
    # applies tf constraints on assignment; functionally equivalent here).
    weight_constraint: tp.Optional[tp.Callable] = None
    mu1_constraint: tp.Optional[tp.Callable] = None
    mu2_constraint: tp.Optional[tp.Callable] = None
    sigma_constraint: tp.Optional[tp.Callable] = None
    bias_constraint: tp.Optional[tp.Callable] = None
    # regularizers: collected via `regularization_loss(params)` (TF variable
    # collections have no flax analogue; add the returned scalar to the loss)
    weight_regularizer: tp.Optional[tp.Callable] = None
    mu1_regularizer: tp.Optional[tp.Callable] = None
    mu2_regularizer: tp.Optional[tp.Callable] = None
    sigma_regularizer: tp.Optional[tp.Callable] = None
    bias_regularizer: tp.Optional[tp.Callable] = None
    mu_learning_rate_factor: float = 500.0
    dau_unit_border_bound: float = 0.01
    dau_unit_single_dim: bool = False
    dau_aggregation_forbid_positive_dim1: bool = False
    dau_sigma_trainable: bool = False
    dau_mu_interpolation: bool = True
    dau_sigma_init: float = 0.5
    # Largest sigma a trainable sigma may grow to: sizes the static blur
    # filter generously up front (the reference re-sizes its filter whenever
    # sigma changes, base_dau_conv_layer.cpp:146-158; under jit the size is
    # static, and the op clips sigma to the filter's support). None =
    # the reference's own 17x17-filter hard limit (sigma 1.6, convolve.cu:40)
    # when trainable, else just dau_sigma_init.
    dau_sigma_max: tp.Optional[float] = None
    unit_testing: bool = False
    # Static promise that |mu| stays <= this bound: shrinks the synthesized
    # aggregation kernel to the matching tier and clips mu accordingly.
    # Trace-time replacement for the reference's per-step amax(mu) kernel-tier
    # dispatch (dau_conv_op.cpp:223-256); see utils.tiers.tier_for_params for
    # the between-epochs re-jit workflow. None = derive from max_kernel_size.
    static_max_offset: tp.Optional[float] = None
    # 'auto' (default): resolved by DAUConvSettings - fourier for the
    # production bf16 path (wins every measured model shape), xla for
    # f32/'highest' (the oracle-exact mode). See PERF_NOTES.md.
    engine: str = "auto"
    # Fused-backward policy knobs, forwarded to DAUConvSettings (see the
    # field docs there; defaults are the measured production policy)
    fused_bwd: str = "auto"
    fused_dx: str = "auto"
    fused_gather: str = "phi"
    # rebuild the fourier phase table in the backward instead of stashing
    # it as a residual (activation-memory saver for large-batch training)
    remat_phi: bool = False
    # SERVING: cache the fourier phase table as a 'phi_cache' flax variable
    # collection. At init the cache is computed from the fresh params; at
    # apply the layer consumes the cached table and skips the per-call
    # build (a constant at serving - the reference has no serving path;
    # this extends its "prefilter cached until sigma changes" idea,
    # base_dau_conv_layer.cpp:414-434, to the offset table). INFERENCE
    # ONLY: the cached-phi forward carries no w/mu gradients. After
    # loading trained params, refresh with `refresh_phi_cache` (or
    # apply(..., mutable=['phi_cache'])). No-op for non-fourier engines.
    phi_caching: bool = False
    # None = auto: 'highest' (oracle-exact f32) for float32, 'default'
    # (native bf16 MXU) otherwise
    precision: tp.Optional[str] = None
    dtype: tp.Any = jnp.float32

    @property
    def padding(self) -> int:
        return int(math.floor(self.max_kernel_size / 2.0))

    def _sigma_cap(self) -> float:
        """Largest sigma this layer's static blur filter must support."""
        if not self.dau_sigma_trainable:
            return self.dau_sigma_init
        cap = 1.6 if self.dau_sigma_max is None else self.dau_sigma_max
        return max(self.dau_sigma_init, cap)

    def _unit_info(self):
        return _rounded_units(tuple(self.dau_units))

    @property
    def num_dau_units_all(self) -> int:
        return self._unit_info()[1]

    @property
    def num_dau_units_ignore(self) -> int:
        return self._unit_info()[2]

    def dau_param_shape(self, in_channels: int):
        return (1, in_channels, self.num_dau_units_all, self.filters)

    def regularization_loss(self, params) -> jax.Array:
        """Sum of the configured per-parameter regularizers over this layer's
        param dict (reference: TF regularization-loss collections,
        dau_conv.py:387-440). Add the result to your training loss."""
        pairs = (("weights", self.weight_regularizer),
                 ("mu1", self.mu1_regularizer),
                 ("mu2", self.mu2_regularizer),
                 ("sigma", self.sigma_regularizer),
                 ("bias", self.bias_regularizer))
        total = jnp.zeros(())
        for name, reg in pairs:
            if reg is not None and name in params:
                total = total + reg(params[name])
        return total

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 4:
            raise ValueError(f"DAUConv2d expects rank-4 input, got {inputs.shape}")
        channels_last = self.data_format in ("channels_last", "NHWC")
        x = jnp.transpose(inputs, (0, 3, 1, 2)) if channels_last else inputs

        s_ch = x.shape[1]
        units, num_all, num_ignore = self._unit_info()
        pshape = (1, s_ch, num_all, self.filters)

        max_val = math.floor(self.max_kernel_size / 2.0) - 1
        w_init = ZeroNLast(self.weight_initializer, num_ignore, axis=2)
        mu1_init = self.mu1_initializer or DAUGridMean(units, max_val, dau_unit_axis=2)
        mu2_init = (self.mu2_initializer or
                    (nn.initializers.zeros if self.dau_unit_single_dim
                     else DAUGridMean(units, max_val, dau_unit_axis=1)))
        sigma_init = self.sigma_initializer or nn.initializers.constant(self.dau_sigma_init)

        w = self.param("weights", w_init, pshape, self.dtype)
        mu1 = self.param("mu1", mu1_init, pshape, self.dtype)
        mu2 = self.param("mu2", mu2_init, pshape, self.dtype)
        sigma = self.param("sigma", sigma_init, (1,), self.dtype)

        if self.weight_constraint is not None:
            w = self.weight_constraint(w)
        if self.mu1_constraint is not None:
            mu1 = self.mu1_constraint(mu1)
        if self.mu2_constraint is not None:
            mu2 = self.mu2_constraint(mu2)
        if self.sigma_constraint is not None:
            sigma = self.sigma_constraint(sigma)

        if not self.dau_sigma_trainable:
            sigma = jax.lax.stop_gradient(sigma)
        else:
            # In-graph clip, like mu below: the op clips the EFFECTIVE
            # sigma, but its analytic VJP returns the gradient
            # unconditionally, so without this the raw param drifts
            # unbounded past the floor (observed: 0.5 -> 0.18 in 30 digits
            # steps). The clip's autodiff zeroes the out-of-range gradient
            # - the layer analogue of the reference's in-place param
            # bounds guard (base_dau_conv_layer.cu:33-49).
            sigma = jnp.clip(sigma, DAUConvSettings.sigma_lower_bound,
                             self._sigma_cap())
        if self.dau_unit_single_dim:
            # 1D DAU: mu2 pinned at zero (reference mu2 zero-constraint,
            # dau_conv.py:562-563).
            mu2 = jnp.zeros_like(mu2)

        # layer-level clip keeping units inside the kernel
        # (reference dau_conv.py:183,188-195); a static_max_offset tier
        # promise tightens the clip so it is always safe.
        bound = math.floor(self.max_kernel_size / 2.0) - self.dau_unit_border_bound
        if self.static_max_offset is not None:
            bound = min(bound, self.static_max_offset)
        mu1 = jnp.clip(mu1, -bound, bound)
        mu2 = jnp.clip(mu2, -bound, bound)

        precision = self.precision
        if precision is None:
            precision = "highest" if jnp.dtype(self.dtype) == jnp.float32 else "default"
        cfg = DAUConvSettings(
            kernel_size=self.max_kernel_size,
            use_interpolation=self.dau_mu_interpolation,
            number_units_ignore=num_ignore,
            single_dim_kernel=self.dau_unit_single_dim,
            forbid_positive_dim1=self.dau_aggregation_forbid_positive_dim1,
            mu_learning_rate_factor=self.mu_learning_rate_factor,
            component_border_bound=self.dau_unit_border_bound,
            unit_testing=self.unit_testing,
            blur_size=blur_kernel_size(self._sigma_cap()),
            compute_sigma_grad=self.dau_sigma_trainable,
            static_max_offset=self.static_max_offset,
            engine=self.engine,
            precision=precision,
            fused_bwd=self.fused_bwd,
            fused_dx=self.fused_dx,
            fused_gather=self.fused_gather,
            remat_phi=self.remat_phi,
        )

        sigma_tiled = jnp.broadcast_to(sigma.reshape(1, 1, 1, 1), pshape)
        if self.phi_caching and cfg.engine == "fourier":
            from ..ops.dau_conv import dau_conv2d_infer, precompute_phi

            def build():
                return precompute_phi(cfg, x.shape[-2:],
                                      w.astype(x.dtype), mu1, mu2)

            pv = self.variable("phi_cache", "phi", build)
            if (not self.is_initializing()
                    and self.is_mutable_collection("phi_cache")):
                pv.value = build()  # explicit mutable apply = refresh
            out = dau_conv2d_infer(cfg, x, w, mu1, mu2, sigma_tiled,
                                   phi=pv.value)
        else:
            out = dau_conv2d_op(cfg, x, w, mu1, mu2, sigma_tiled)

        if self.strides > 1:
            # stride emulated by output slicing, same compute as stride 1
            # (reference dau_conv.py:339-342,496-498)
            out = out[:, :, ::self.strides, ::self.strides]

        if self.use_bias:
            bias = self.param("bias", self.bias_initializer, (self.filters,), self.dtype)
            out = out + bias.reshape(1, self.filters, 1, 1)

        if self.activation is not None:
            out = self.activation(out)
        return jnp.transpose(out, (0, 2, 3, 1)) if channels_last else out


class DAUConv1d(DAUConv2d):
    """1D DAU convolution: units displace only along x; the aggregation
    kernel is masked to the centre row (reference dau_conv.py:557-570).
    """

    dau_unit_single_dim: bool = True


def dau_conv2d(inputs, filters, dau_units, max_kernel_size, *,
               stride=1, mu_learning_rate_factor=500,
               data_format="channels_first",
               activation_fn=nn.relu, normalizer_fn=None,
               normalizer_params=None,
               weights_initializer=nn.initializers.normal(stddev=0.1),
               weights_regularizer=None, weights_constraint=None,
               mu1_initializer=None, mu1_regularizer=None, mu1_constraint=None,
               mu2_initializer=None, mu2_regularizer=None, mu2_constraint=None,
               sigma_initializer=None, sigma_regularizer=None,
               sigma_constraint=None,
               biases_initializer=nn.initializers.zeros,
               biases_regularizer=None, biases_constraint=None,
               dau_unit_border_bound=0.01,
               dau_sigma_trainable=False,
               dau_mu_interpolation=True,
               name=None, **layer_kwargs):
    """Functional wrapper in the style of the reference contrib API
    (dau_conv.py:579-688): layer + optional normalizer + activation.
    Must be called inside a flax module's compact scope. `normalizer_fn`
    receives the pre-activation output (e.g. a flax BatchNorm instance or
    any callable)."""
    use_bias = normalizer_fn is None and biases_initializer is not None
    layer = DAUConv2d(
        filters=filters, dau_units=dau_units, max_kernel_size=max_kernel_size,
        strides=stride, data_format=data_format, activation=None,
        use_bias=use_bias,
        weight_initializer=weights_initializer,
        weight_regularizer=weights_regularizer,
        weight_constraint=weights_constraint,
        mu1_initializer=mu1_initializer, mu2_initializer=mu2_initializer,
        mu1_regularizer=mu1_regularizer, mu1_constraint=mu1_constraint,
        mu2_regularizer=mu2_regularizer, mu2_constraint=mu2_constraint,
        sigma_initializer=sigma_initializer,
        sigma_regularizer=sigma_regularizer,
        sigma_constraint=sigma_constraint,
        bias_initializer=biases_initializer or nn.initializers.zeros,
        bias_regularizer=biases_regularizer,
        bias_constraint=biases_constraint,
        mu_learning_rate_factor=mu_learning_rate_factor,
        dau_unit_border_bound=dau_unit_border_bound,
        dau_sigma_trainable=dau_sigma_trainable,
        dau_mu_interpolation=dau_mu_interpolation,
        name=name, **layer_kwargs)
    out = layer(inputs)
    if normalizer_fn is not None:
        out = normalizer_fn(out, **(normalizer_params or {}))
    if activation_fn is not None:
        out = activation_fn(out)
    return out


def dau_conv1d(inputs, filters, dau_units, max_kernel_size, *,
               dau_aggregation_forbid_positive_dim1=False, **kwargs):
    """1D variant of `dau_conv2d` (reference dau_conv.py:691-795)."""
    use_bias = kwargs.pop("normalizer_fn", None) is None
    activation_fn = kwargs.pop("activation_fn", nn.relu)
    layer = DAUConv1d(
        filters=filters, dau_units=dau_units, max_kernel_size=max_kernel_size,
        use_bias=use_bias,
        dau_aggregation_forbid_positive_dim1=dau_aggregation_forbid_positive_dim1,
        activation=None, **kwargs)
    out = layer(inputs)
    if activation_fn is not None:
        out = activation_fn(out)
    return out
