"""The DAU convolution primitive: `dau_conv2d_op` with a custom VJP.

TPU-native equivalent of the reference's layer orchestration + TF ops:

- `BaseDAUConvLayer::Forward_gpu/Backward_gpu`
  (reference src/dau_conv/base_dau_conv_layer.cu:15-363),
- the `DAUConv` / `DAUConvGrad` TensorFlow ops
  (plugins/tensorflow/src/dau_conv_op.cpp:150-320,
  plugins/tensorflow/src/dau_conv_grad_op.cpp:115-305).

What vanished by design, per the TPU compilation model:
- workspace carving / 4 CUDA streams / events (base_dau_conv_layer.cpp:
  302-391, .cu:65-127): XLA owns buffers and scheduling.
- the runtime `amax(mu)` device->host sync that picks a CUDA kernel tier
  (dau_conv_op.cpp:223-256): under jit shapes are static, so the tap bound
  comes from the static `max_kernel_size` (see xla_engine docstring); use
  `utils.tiers.snap_kernel_tier` to pick a smaller static tier when offsets
  are known to be bounded.
- 11 + 17 manually instantiated CUDA kernels: jit specialization.

The backward rule reproduces the reference's *analytic* parameter gradients
(Gaussian-derivative filters), NOT autodiff of the bilinear forward - the
two differ for mu/sigma, and the reference semantics (== its numpy oracle)
are the contract. w-grad and input-grad coincide with true autodiff since
the forward is linear in both.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp

from . import xla_engine
from ._edge import disabled_edges
from ..utils import math as dmath
from .gaussian import (depthwise_blur, gaussian_factor_filters,
                       gaussian_filters, rank1_blur, rank1_blur_stack)

__all__ = ["DAUConvSettings", "dau_conv2d_op", "edge_gradient_mask",
           "precompute_phi", "dau_conv2d_infer"]

_log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DAUConvSettings:
    """Static configuration of a DAU convolution.

    Mirrors the reference `DAUConvSettings` struct
    (include/dau_conv/base_dau_conv_layer.hpp:109-130) and the TF op attrs
    (dau_conv_op.cpp:22-48); names kept for API fidelity. Fields that are
    dead in the reference (`merge_iteration_step`, `merge_threshold`:
    `merge_components()` is commented out, base_dau_conv_layer.cu:28-30) are
    accepted as documented no-ops.
    """

    kernel_size: int = 9                 # static max kernel size (tap bound)
    use_interpolation: bool = True       # bilinear (4-tap) sub-pixel shift
    number_units_ignore: int = 0         # trailing dummy units (group-of-2 pad)
    single_dim_kernel: bool = False      # 1D DAU: blur only along x
    forbid_positive_dim1: bool = False   # zero blur taps at x > 0 (1D causal)
    mu_learning_rate_factor: float = 1.0 # extra factor on mu1/mu2 grads
    # NaN -> 0 on the final mu1/mu2 gradients (the reference applies this
    # unconditionally as the last step of Backward_gpu,
    # base_dau_conv_layer.cu:354-356): a diverged w (0*inf in the
    # grads*w chain-rule multiply) self-heals in mu instead of poisoning
    # the positions. w/sigma/input grads are NOT guarded, matching the
    # reference. Off = raw analytic grads (useful for debugging NaN
    # sources).
    nan_guard_mu_grads: bool = True
    unit_normalization: bool = True      # blur filter sums to 1
    square_unit_normalization: bool = False
    component_border_bound: float = 0.01 # mu clip margin from kernel edge
    sigma_lower_bound: float = 0.3
    unit_testing: bool = False           # ignore_edge_gradients GPU-compat shim
    blur_size: int = 9                   # static blur-filter size (from sigma)
    compute_sigma_grad: bool = True
    # 'xla': dense synthesized-kernel convs (spatial); 'fourier': per-bin
    # spectral contractions (same semantics, ~ks^2/(4G) fewer FLOPs - see
    # fourier_engine.py); 'pallas'/'pallas_fused': hand-written kernels;
    # 'auto' (default): fourier for precision='default' (wins every measured
    # production/bf16 model shape, PERF_NOTES.md per-layer table), xla for
    # precision='highest' (the f32 oracle mode, where the dense engine's
    # 6-pass HIGHEST matmuls measured faster). Resolved at construction.
    engine: str = "auto"
    # 'highest' = true-f32 MXU passes (oracle-exact; required for the
    # differential tests); 'default' = native bf16 MXU passes (production
    # speed; ~1e-2 relative error on f32 inputs, exact-enough for bf16).
    precision: str = "highest"
    # Static promise that |mu| <= static_max_offset, shrinking the synthesized
    # aggregation kernel. This is the trace-time replacement for the
    # reference's *runtime* kernel-tier dispatch (it reads amax(mu) from the
    # device each step and re-picks the CUDA kernel, dau_conv_op.cpp:223-256;
    # under jit shapes must be static). None = derive from kernel_size.
    static_max_offset: tp.Optional[float] = None
    # Fused Pallas backward kernel policy for the fourier engine:
    # 'auto' = use it when the measured gate says it wins (TPU backend,
    # VMEM plan exists, bin-count gate for the phi gather); 'on' = force
    # (still requires a plan; runs the kernel in interpret mode off-TPU);
    # 'off' = always the unfused XLA path. Under a mesh context (see
    # `data_axis` / `model_axis`) the kernel runs per-shard inside
    # `jax.shard_map` over the applicable axes (batch over data with a psum
    # closing the unit-grad reduction; F over model with a psum closing dx)
    # - sharded training keeps the production kernel. A config field, NOT
    # an env var: trace-time env reads bake silently into cached
    # executables (round-2 advisory).
    fused_bwd: str = "auto"
    # Mesh axis the batch is sharded over (parallel.make_mesh's default
    # name). When the ambient mesh (jax.sharding.set_mesh /
    # parallel.make_train_step) carries this axis, the fused backward is
    # shard_map-wrapped over it instead of falling back to the unfused
    # path.
    data_axis: str = "data"
    # Mesh axis the output-channel (F) dim is sharded over under tensor
    # parallelism (parallel.dau_param_spec's default name). When the ambient
    # mesh carries this axis and F divides it, the fused backward partitions
    # the F dim of the error/params into the shard_map region as well (unit
    # grads stay F-sharded; a psum over this axis closes dx) instead of
    # gathering F and duplicating the kernel's work per model shard.
    model_axis: str = "model"
    # Emit the input gradient from the SAME fused backward kernel invocation
    # (the unit phase factors already live in VMEM there; requires
    # use_interpolation): 'on' = whenever the fused backward runs, 'off' =
    # always the stashed-phi conj(Phi) dx path, 'auto' = the measured
    # in-step policy. Measured (PERF_NOTES round 3): STANDALONE the fusion
    # wins big (conv4 1.174 vs 1.70 ms - the in-kernel dx marginal is
    # ~0.09 ms vs ~0.5 for phi-build + dx-apply), but IN-STEP it loses
    # ~0.3-0.5 ms (whole-step A/B 7.76 off vs 8.01/8.32 on): the opaque
    # custom call cannot overlap neighboring layers' work the way the
    # unfused dx chain's HBM traffic does. 'auto' therefore resolves to
    # off in the training step; 'on' remains right for latency-dominated
    # single-layer use.
    fused_dx: str = "auto"
    # In-kernel spectral gather form: 'phi' (production) builds each unit's
    # phase factor over all bins; 'factored' contracts the cross-spectra
    # against the integer-exponent tables once (per-unit work independent
    # of the bin count); 'auto' picks per shape at trace time - factored
    # above FACTORED_MIN_BINS bins, phi below (see _resolve_gather).
    # Measured (PERF_NOTES rounds 3+5): phi wins the B<=256 shapes (conv4
    # B=153: phi fused 0.93 vs factored 2.18 ms), and at high-bin shapes
    # the blocked-dot factored kernel loses to the UNFUSED path (conv2
    # B=496: unfused 0.72 vs factored fused 0.97; the round-3 per-row
    # factored form had tied at 0.71 - the blocked-dot rewrite regressed
    # it). The default stays 'phi' + the fused auto-gate keeping conv2
    # unfused, and 'auto' resolves to phi everywhere (FACTORED_MIN_BINS
    # is None); 'factored' remains an explicit opt-in. Re-calibrate from
    # benchmarks/fused_bwd_probe.py when the kernels change.
    fused_gather: str = "phi"
    # Rematerialize the fourier engine's phase table in the backward
    # instead of stashing it as a VJP residual: saves 2*B*S*F bytes of HBM
    # per layer activation set (~45 MB at AlexNet conv4 bf16) for one extra
    # phi build in the backward (~0.16 ms at conv4). Off by default (the
    # measured N=32 step is compute-bound, not memory-bound); turn on for
    # large-batch / deep configs where activation memory is the limit -
    # the DAU analogue of jax.checkpoint on the layer.
    remat_phi: bool = False
    # accepted-for-parity no-ops (dead in the reference):
    merge_iteration_step: int = 0
    merge_threshold: float = 1.0
    mean_iteration_step: int = 0
    sigma_iteration_step: int = 0

    def __post_init__(self):
        if self.kernel_size % 2 != 1 or self.kernel_size < 1:
            raise ValueError(f"kernel_size must be odd and >= 1, got {self.kernel_size}")
        if self.engine not in ("auto", "xla", "fourier", "pallas", "pallas_fused"):
            raise ValueError(f"unknown engine {self.engine!r}")
        if self.precision not in ("highest", "default"):
            raise ValueError(f"unknown precision {self.precision!r}")
        if self.fused_bwd not in ("auto", "on", "off"):
            raise ValueError(f"unknown fused_bwd {self.fused_bwd!r}")
        if self.fused_dx not in ("auto", "on", "off"):
            raise ValueError(f"unknown fused_dx {self.fused_dx!r}")
        if self.fused_gather not in ("auto", "factored", "phi"):
            raise ValueError(f"unknown fused_gather {self.fused_gather!r}")
        if self.engine == "auto":
            # measured basis: PERF_NOTES.md per-layer table (fourier wins all
            # bf16 model shapes); the f32-HIGHEST layer record is the dense
            # engine's (1.235 ms reference-speedtest layer).
            object.__setattr__(
                self, "engine",
                "fourier" if self.precision == "default" else "xla")
        if self.sigma_lower_bound > self.sigma_upper_bound:
            raise ValueError(
                f"sigma_lower_bound {self.sigma_lower_bound} exceeds the "
                f"largest sigma the static blur_size={self.blur_size} filter "
                f"supports ({self.sigma_upper_bound}); increase blur_size "
                "(reference re-sizes the filter dynamically, "
                "base_dau_conv_layer.cpp:146-158 - under jit it is static)")

    @property
    def max_offset(self) -> float:
        """Largest representable |mu| (the layer clips to this)."""
        bound = self.kernel_size // 2 - self.component_border_bound
        if self.static_max_offset is not None:
            bound = min(bound, self.static_max_offset)
        return bound

    @property
    def lax_precision(self):
        return (jax.lax.Precision.HIGHEST if self.precision == "highest"
                else jax.lax.Precision.DEFAULT)

    @property
    def synth_kernel_size(self) -> int:
        """Size of the synthesized aggregation kernel: bilinear taps reach
        floor(max_offset) + 1 in each direction."""
        return 2 * (int(math.floor(self.max_offset)) + 1) + 1

    @property
    def sigma_upper_bound(self) -> float:
        """Largest sigma the static blur filter supports without truncation.

        Inverse of the reference's dynamic filter sizing
        2*ceil(5*sigma)+1 <= blur_size (base_dau_conv_layer.cpp:146-147):
        the op clips sigma into [sigma_lower_bound, sigma_upper_bound], so a
        trainable sigma can never silently truncate against the static
        filter support."""
        return (self.blur_size - 1) / 10.0


def edge_gradient_mask(h: int, w: int, dtype=jnp.float32):
    """Static (h, w) mask zeroing the last row/col per the reference's GPU
    tile rule - only used under `unit_testing` for CUDA-compat differential
    tests (dau_conv_test.py:107-136, dau_conv_backward_core.hpp:2477-2560).
    """
    zero_row, zero_col = disabled_edges(h, w)
    mask = jnp.ones((h, w), dtype=dtype)
    if zero_col:
        mask = mask.at[:, w - 1].set(0.0)
    if zero_row:
        mask = mask.at[h - 1, :].set(0.0)
    return mask


def _unit_mask(s: int, g: int, f: int, num_ignore: int, dtype):
    """(S, G, F) mask that zeroes the trailing `num_ignore` dummy units
    (reference `set_last_n_gauss_to_zero`, base_dau_conv_layer.cu:365-381)."""
    if num_ignore == 0:
        return None
    gmask = (jnp.arange(g) < g - num_ignore).astype(dtype)
    return jnp.broadcast_to(gmask[None, :, None], (s, g, f))


def _squeeze_params(w, mu1, mu2):
    """Accept reference [1, S, G, F] or bare [S, G, F] parameter layout."""
    if w.ndim == 4:
        if w.shape[0] != 1:
            raise ValueError(f"expected leading param dim 1, got {w.shape}")
        return w[0], mu1[0], mu2[0], True
    return w, mu1, mu2, False


def _sigma_scalar(cfg: DAUConvSettings, sigma):
    """The layer-shared blur sigma: first element of the (tiled) sigma tensor
    (the reference shares one sigma across the layer; dau_conv.py:417-430),
    clipped into [sigma_lower_bound, sigma_upper_bound] - the reference's
    bounds guard (base_dau_conv_layer.cu:33-49) plus the static-filter
    support bound replacing its dynamic blur-kernel re-sizing
    (base_dau_conv_layer.cpp:146-158,415-434)."""
    value = jnp.reshape(sigma, (-1,))[0]
    return jnp.clip(value, cfg.sigma_lower_bound, cfg.sigma_upper_bound)


def _filters(cfg: DAUConvSettings, sigma_value):
    return gaussian_filters(
        sigma_value,
        size=cfg.blur_size,
        single_dim_kernel=cfg.single_dim_kernel,
        forbid_positive_dim1=cfg.forbid_positive_dim1,
        unit_normalization=cfg.unit_normalization,
        square_unit_normalization=cfg.square_unit_normalization,
        dtype=jnp.dtype(jnp.result_type(sigma_value, jnp.float32)),
    )


def _aggregate(cfg: DAUConvSettings, x_blur, w, mu1, mu2, phi=None):
    if cfg.engine in ("pallas", "pallas_fused"):
        from ..kernels.forward import aggregate_forward_pallas
        return aggregate_forward_pallas(
            x_blur, w, mu1, mu2, cfg.synth_kernel_size, cfg.use_interpolation)
    if cfg.engine == "fourier":
        from . import fourier_engine
        return fourier_engine.fourier_forward(
            x_blur, w, mu1, mu2, cfg.synth_kernel_size, cfg.use_interpolation,
            precision=cfg.lax_precision, phi=phi)
    return xla_engine.aggregate_forward(
        x_blur, w, mu1, mu2, cfg.synth_kernel_size, cfg.use_interpolation,
        precision=cfg.lax_precision)


def _build_phi(cfg: DAUConvSettings, spatial, w3m, mu13, mu23):
    """Bin-major spectral phase table shared by the fourier fwd + dx passes.

    Phase factors come from integer cos/sin tables (floor(mu) is bounded by
    the mu clip, so e^{i w floor(mu)} is a lookup realized as a skinny
    matmul): measured 0.54 -> 0.34 ms per conv4-shape build vs runtime
    transcendentals, exact to table roundoff (angles are f64 host-side)."""
    from . import fourier_engine
    h, wd = spatial
    p1, p2, rb = fourier_engine.plan_bins(h, wd, cfg.synth_kernel_size)
    return fourier_engine.build_phi(w3m, mu13, mu23, p1, p2, rb,
                                    cfg.use_interpolation,
                                    phase_span=cfg.synth_kernel_size // 2 + 1,
                                    precision=cfg.lax_precision)


def _factor_filters(cfg: DAUConvSettings, sigma_value):
    """Separable 1D factorization of the blur filters (see
    gaussian.gaussian_factor_filters)."""
    return gaussian_factor_filters(
        sigma_value,
        size=cfg.blur_size,
        single_dim_kernel=cfg.single_dim_kernel,
        forbid_positive_dim1=cfg.forbid_positive_dim1,
        unit_normalization=cfg.unit_normalization,
        square_unit_normalization=cfg.square_unit_normalization,
        dtype=jnp.dtype(jnp.result_type(sigma_value, jnp.float32)),
    )


def _blur(cfg: DAUConvSettings, x, sigma_value, name: str):
    """Engine-dispatched blur. The fourier production engine uses the
    separable banded-matmul form (identical zero-pad semantics; XLA lowers
    grouped NCHW depthwise convs off the TPU fast path - measured 0.89 ms
    for the M=3 filter stack at AlexNet conv2 vs ~0.03 ms as matmuls); the
    dense/pallas engines keep the depthwise conv."""
    if cfg.engine == "fourier":
        vecs, terms = _factor_filters(cfg, sigma_value)
        return rank1_blur(x, vecs, terms[name], precision=cfg.lax_precision)
    return depthwise_blur(x, _filters(cfg, sigma_value)[name],
                          precision=cfg.lax_precision)


def _blur_and_aggregate(cfg: DAUConvSettings, x, sigma_value, w, mu1, mu2,
                        phi=None, blur_name: str = "w"):
    """Blur + offset-and-sum, the engine-dispatched forward chain. The
    'pallas_fused' engine computes the blur inside the aggregation kernel
    (the intermediate never touches HBM)."""
    if cfg.engine == "pallas_fused":
        from ..kernels.forward import dau_forward_fused_pallas
        filt = _filters(cfg, sigma_value)[blur_name]
        return dau_forward_fused_pallas(
            x, w, mu1, mu2, filt, cfg.synth_kernel_size,
            cfg.use_interpolation)
    x_blur = _blur(cfg, x, sigma_value, blur_name)
    return _aggregate(cfg, x_blur, w, mu1, mu2, phi=phi)


def _forward_impl(cfg: DAUConvSettings, x, w, mu1, mu2, sigma, phi=None):
    w3, mu13, mu23, _ = _squeeze_params(w, mu1, mu2)
    mask = _unit_mask(*w3.shape, cfg.number_units_ignore, w3.dtype)
    if mask is not None:
        w3 = w3 * mask
    if phi is None and cfg.engine == "fourier":
        # one phi build path everywhere (integer tables, f64 host angles):
        # the primal-only call (inference without grad) matches the
        # _fwd_rule/table numerics exactly instead of diverging by the
        # runtime-trig build's roundoff
        phi = _build_phi(cfg, x.shape[-2:], w3.astype(x.dtype), mu13, mu23)
    return _blur_and_aggregate(cfg, x, _sigma_scalar(cfg, sigma),
                               w3, mu13, mu23, phi=phi)


def precompute_phi(cfg: DAUConvSettings, spatial, w, mu1, mu2,
                   dtype=None):
    """Prebuild the fourier engine's spectral phase table for FROZEN params.

    The phase table Phi[k,s,f] depends only on (w, mu1, mu2) and the input
    spatial shape - at serving time the params are constants, so Phi is a
    constant too. Building it once and passing it to `dau_conv2d_infer`
    removes the per-call build (~0.5-0.6 ms/step over the four AlexNet-DAU
    layers) from the inference path entirely. The reference has no serving
    path (inference = the same op, README.md:37-39); this is the TPU-native
    serving analogue of its "prefilter kernels cached until sigma changes"
    idea (base_dau_conv_layer.cpp:414-434) applied to the offset table.

    Args:
      cfg: settings with engine resolving to 'fourier' (ValueError otherwise
        - the dense engines have no phase table to cache).
      spatial: (H, W) of the inputs the op will serve.
      w, mu1, mu2: unit parameters, (1, S, G, F) or (S, G, F).
      dtype: table dtype; defaults to w's dtype (use the serving input
        dtype, e.g. jnp.bfloat16).

    Returns: (phire, phiim) bin-major tables to pass as
    `dau_conv2d_infer(..., phi=...)`.
    """
    if cfg.engine != "fourier":
        raise ValueError(
            f"precompute_phi requires engine='fourier', got {cfg.engine!r}")
    w3, mu13, mu23, _ = _squeeze_params(w, mu1, mu2)
    mask = _unit_mask(*w3.shape, cfg.number_units_ignore, w3.dtype)
    if mask is not None:
        w3 = w3 * mask
    dt = w3.dtype if dtype is None else dtype
    return _build_phi(cfg, tuple(spatial), w3.astype(dt), mu13, mu23)


def dau_conv2d_infer(cfg: DAUConvSettings, x, w, mu1, mu2, sigma, phi=None):
    """Forward-only DAU convolution for serving.

    Same numerics as `dau_conv2d_op` (it IS the same forward
    implementation), without the custom-VJP machinery, and with an optional
    prebuilt `phi` from `precompute_phi` so frozen-weight serving skips the
    per-call phase-table build. `phi` requires engine='fourier' and must
    have been built for x's spatial shape and dtype.
    """
    if phi is not None and cfg.engine != "fourier":
        raise ValueError(
            f"phi is a fourier-engine table; engine is {cfg.engine!r}")
    return _forward_impl(cfg, x, w, mu1, mu2, sigma, phi=phi)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def dau_conv2d_op(cfg: DAUConvSettings, x, w, mu1, mu2, sigma):
    """Displaced Aggregation Unit convolution.

    Args:
      cfg: static `DAUConvSettings`.
      x: (N, S, H, W) input, NCHW.
      w, mu1, mu2: unit parameters, (1, S, G, F) (reference layout,
        dau_conv.py:378-385) or (S, G, F).
      sigma: layer-shared Gaussian width; any shape broadcastable from a
        scalar (the reference passes it tiled to (1, S, G, F)).

    Returns: (N, F, H, W).
    """
    return _forward_impl(cfg, x, w, mu1, mu2, sigma)


def _fwd_rule(cfg, x, w, mu1, mu2, sigma):
    phi = None
    if cfg.engine == "fourier":
        # build the spectral phase table once; the bwd rule reuses it for the
        # input gradient (Phi(-mu, S<->F) == conj(Phi), see fourier_engine).
        # (Stashing the forward SPECTRUM for the m=w cross-spectra operand
        # was tried and REGRESSED the step 11.7 -> 12.3 ms: pinning it in
        # residuals and splitting the cross-matmul cost more than the saved
        # blur+DFT - see PERF_NOTES.md negative results.)
        w3, mu13, mu23, _ = _squeeze_params(w, mu1, mu2)
        mask = _unit_mask(*w3.shape, cfg.number_units_ignore, w3.dtype)
        if mask is not None:
            w3 = w3 * mask
        phi = _build_phi(cfg, x.shape[-2:], w3.astype(x.dtype), mu13, mu23)
    y = _forward_impl(cfg, x, w, mu1, mu2, sigma, phi=phi)
    # remat_phi: the phase table (2*B*S*F bytes/layer) is rebuilt by the
    # bwd rule instead of living in the residuals until the backward runs
    res_phi = None if cfg.remat_phi else phi
    return y, (x, w, mu1, mu2, sigma, res_phi)


def _reduce_to_shape(g, shape):
    """Sum-reduce a full gradient back to a broadcast-origin shape."""
    if g.shape == tuple(shape):
        return g
    ndiff = g.ndim - len(shape)
    if ndiff > 0:
        g = jnp.sum(g, axis=tuple(range(ndiff)))
    axes = tuple(i for i, (gd, sd) in enumerate(zip(g.shape, shape)) if sd != gd)
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return g.reshape(shape)


# Calibration point for fused_gather='auto': the fused backward picks the
# table-factored gather at or above this many frequency bins and the
# per-unit phi gather below. Round-5 recalibration (2026-08-19, on-chip,
# uncontended, benchmarks/fused_bwd_probe.py): the blocked-dot factored
# kernel is a measured NEGATIVE at BOTH bin regimes - conv4 B=153 phi
# fused 0.93 vs factored 2.18 ms, conv2 B=496 unfused 0.72 vs factored
# fused 0.97 ms (the round-3 per-row factored form had tied unfused at
# conv2 with 0.71; the blocked-dot rewrite regressed it - PERF_NOTES
# round 5). 'auto' therefore resolves to phi at every bin count (the
# phi form's own B <= 256 fused gate then falls back to the unfused
# spectral gather at high-bin shapes, which is the measured best there);
# 'factored' stays available as an explicit opt-in. Re-calibrate from
# benchmarks/fused_bwd_probe.py when the kernels change.
FACTORED_MIN_BINS = None  # disabled: phi/unfused win every measured regime


def _resolve_gather(cfg: "DAUConvSettings", bins: int) -> str:
    """Trace-time resolution of the fused backward's gather form."""
    if cfg.fused_gather != "auto":
        return cfg.fused_gather
    if FACTORED_MIN_BINS is not None and bins >= FACTORED_MIN_BINS:
        return "factored"
    return "phi"


def _shardable_axis(am, axis: str, dim: int) -> tp.Optional[str]:
    """Mesh axis name if it exists, is >1, and evenly divides `dim`."""
    if (not am.empty and axis in am.axis_names and am.shape[axis] > 1
            and dim % am.shape[axis] == 0):
        return axis
    return None


def _fused_grads_call(cfg: DAUConvSettings, route: str, gather: str,
                      xb, gy, mu13, mu23, gy_blur=None, w_units=None):
    """Invoke the fused backward kernel, optionally shard_mapped over the
    data axis of the ambient mesh.

    route='direct': plain call (single device, or forced).
    route='shard_map': per-shard kernel over the mesh axes that apply.
    Over `cfg.data_axis`: the unit-grad reduction over images is linear, so
    each shard reduces its local batch and a psum over the axis completes
    it; dx stays batch-sharded. Over `cfg.model_axis` (when F divides it):
    the error/param F dim enters the region partitioned, each shard emits
    the unit grads for its own F slice (no collective needed - the grads
    stay F-sharded, matching `parallel.dau_param_spec`), and a psum over
    the axis closes dx (the input grad sums contributions across F).
    Otherwise F is gathered and each model shard runs the full-F kernel.
    This is the TPU-native replacement for what the reference never had
    (single-GPU library): the production kernel running under data/tensor
    parallelism (SURVEY.md section 2.3 plan).
    """
    from . import fourier_engine

    def call(xb_, gy_, mu13_, mu23_, gy_blur_, w_units_):
        return fourier_engine.fourier_unit_grads_fused2(
            xb_, gy_, mu13_, mu23_, cfg.synth_kernel_size,
            cfg.use_interpolation, precision=cfg.lax_precision,
            err_blur=gy_blur_, w_units=w_units_, gather=gather)

    if route == "direct":
        return call(xb, gy, mu13, mu23, gy_blur, w_units)

    from jax.sharding import PartitionSpec as P

    from ..kernels.fused_bwd import FusedPlanError

    am = jax.sharding.get_abstract_mesh()
    da = _shardable_axis(am, cfg.data_axis, xb.shape[1])
    ma = _shardable_axis(am, cfg.model_axis, mu13.shape[-1])
    with_dx = gy_blur is not None

    def invoke(da, ma):
        _log.info("fused shard_map axes: data=%s model=%s", da, ma)
        if with_dx:
            def local(xb_, gy_, mu13_, mu23_, gy_blur_, w_units_):
                g, dx = call(xb_, gy_, mu13_, mu23_, gy_blur_, w_units_)
                if da is not None:
                    g = jax.lax.psum(g, da)
                if ma is not None:
                    dx = jax.lax.psum(dx, ma)
                return g, dx

            return jax.shard_map(
                local, mesh=am,
                in_specs=(P(None, da), P(da, ma), P(None, None, ma),
                          P(None, None, ma), P(da, ma), P(None, None, ma)),
                out_specs=(P(None, None, None, ma), P(da)), check_vma=False,
            )(xb, gy, mu13, mu23, gy_blur, w_units)

        def local(xb_, gy_, mu13_, mu23_):
            g = call(xb_, gy_, mu13_, mu23_, None, None)
            return jax.lax.psum(g, da) if da is not None else g

        return jax.shard_map(
            local, mesh=am,
            in_specs=(P(None, da), P(da, ma), P(None, None, ma),
                      P(None, None, ma)),
            out_specs=P(None, None, None, ma), check_vma=False,
        )(xb, gy, mu13, mu23)

    if ma is not None:
        try:
            return invoke(da, ma)
        except FusedPlanError:
            # The per-shard F slice has no kernel plan (compiled TPU needs
            # F to be a 128-multiple). Gather F instead - the fused kernel
            # partitioned over data (or forced) still beats dropping to
            # the unfused path. Under 'auto' with no data axis there is
            # nothing left to partition: re-raise so the caller falls back
            # to the unfused form, which partitions F cleanly under GSPMD.
            if da is None and cfg.fused_bwd != "on":
                raise
            _log.info("fused shard_map: no per-shard plan on the model "
                      "axis; gathering F")
            ma = None
    return invoke(da, ma)


def _bwd_rule(cfg: DAUConvSettings, res, gy):
    x, w, mu1, mu2, sigma, phi = res
    w3, mu13, mu23, had_lead = _squeeze_params(w, mu1, mu2)
    s_ch, g_ch, f_ch = w3.shape
    mask = _unit_mask(s_ch, g_ch, f_ch, cfg.number_units_ignore, w3.dtype)
    w3m = w3 * mask if mask is not None else w3

    sigma_value = _sigma_scalar(cfg, sigma)
    filts = _filters(cfg, sigma_value)

    if cfg.engine == "fourier" and phi is None and cfg.remat_phi:
        # rematerialized, not stashed (see DAUConvSettings.remat_phi)
        phi = _build_phi(cfg, x.shape[-2:], w3m.astype(x.dtype), mu13, mu23)

    # ---- input gradient: the forward engine applied to the error with
    # S<->F transposed params, negated offsets, and the mirrored blur filter
    # (reference base_dau_conv_layer.cu:294-325). The fourier engine needs no
    # transposed pass: it reuses the forward Phi conjugated - and on the
    # fused-kernel path dx is emitted by the SAME kernel as the unit grads
    # (see below), so it is deferred. (Only with interpolation: the 2
    # bilinear taps of -mu mirror those of mu exactly, but the single
    # floor-tap of interp-off does not - floor(-mu) != -floor(mu).)
    dx = None
    fourier_dx_ok = (cfg.engine == "fourier" and phi is not None
                     and cfg.use_interpolation)

    # ---- parameter gradients: blur x with the derivative filters, build the
    # position table (conv-backward-filter), tap-gather per unit
    # (reference base_dau_conv_layer.cu:203-241 + finalize :330-356).
    gy_for_params = gy
    if cfg.unit_testing:
        h, w_sp = gy.shape[-2:]
        gy_for_params = gy * edge_gradient_mask(h, w_sp, gy.dtype)

    filter_names = ["w", "dmu1", "dmu2"] + (["dsigma"] if cfg.compute_sigma_grad else [])
    n, _, h, w_sp = x.shape
    if cfg.engine == "fourier":
        vecs, fterms = _factor_filters(cfg, sigma_value)
        xb = rank1_blur_stack(x, vecs, fterms, filter_names,
                              precision=cfg.lax_precision)  # (M, N, S, H, W)
    else:
        fstack = jnp.stack([filts[k] for k in filter_names])  # (M, kb, kb)
        m = fstack.shape[0]
        xb = depthwise_blur(x, fstack, precision=cfg.lax_precision)  # (N, S*M, H, W)
        xb = xb.reshape(n, s_ch, m, h, w_sp)
        xb = jnp.transpose(xb, (2, 0, 1, 3, 4))        # (M, N, S, H, W)

    if cfg.engine in ("pallas", "pallas_fused"):
        from ..kernels.backward import grad_tables_pallas
        table = grad_tables_pallas(xb, gy_for_params, cfg.synth_kernel_size)
        grads = xla_engine.tap_gather(table.astype(xb.dtype), mu13, mu23,
                                      cfg.synth_kernel_size,
                                      cfg.use_interpolation)
    elif cfg.engine == "fourier":
        # spectral tap-gather: unit grads straight from the cross-spectra.
        # On TPU, the fused Pallas kernel (cross + in-kernel spectral
        # gather, cross-spectra never touch HBM) when the VMEM plan fits;
        # otherwise (or on other backends) the unfused XLA form. Measured
        # at AlexNet conv4: dense conv-backward-filter 2.1 ms, Pallas
        # partial-iDFT 2.6 ms, unfused spectral gather 1.25 ms, fused
        # kernel 0.98 ms (PERF_NOTES.md).
        from . import fourier_engine
        from ..kernels.fused_bwd import FusedPlanError
        grads = None
        # The phi gather's in-VMEM phase temporaries scale with
        # bins x s_blk x f_blk, so in 'auto' it gates on bin count
        # (measured conv4 B=153: 0.84 vs 1.37 ms, conv2 B=496: 0.94 vs
        # 0.58 at G=2) - EXCEPT at G >= 4, where the shared cross-spectra
        # amortize over more units and the fused kernel wins even at
        # high-bin shapes (conv2 B=496 G=4: fused 0.84 vs unfused
        # 1.17 ms; whole large-variant step A/B in PERF_NOTES round 5).
        # The factored gather's per-unit work is independent of the
        # bin count - no gate (the VMEM plan itself rejects what won't fit).
        p1_, p2_, rb_ = fourier_engine.plan_bins(
            h, w_sp, cfg.synth_kernel_size)
        gather = _resolve_gather(cfg, p1_ * rb_)
        fused_ok = (cfg.fused_bwd == "on"
                    or (cfg.fused_bwd == "auto"
                        and jax.default_backend() == "tpu"
                        and (p1_ * rb_ <= 256 or g_ch >= 4
                             if gather == "phi" else True)))
        # Routing: GSPMD cannot partition the opaque Mosaic custom call, so
        # under a mesh context the kernel call is shard_map-wrapped over
        # whichever axes apply - the batch over 'data' (psum closes the
        # unit-grad reduction) and, when F divides it, the output-channel
        # dim over 'model' (unit grads stay F-sharded; psum closes dx).
        # Without a mesh context the multi-device case keeps the unfused
        # XLA form (which partitions cleanly); with a mesh the gate reads
        # NO global device state - only the ambient AbstractMesh, which is
        # part of the trace.
        route = None
        if fused_ok:
            am = jax.sharding.get_abstract_mesh()
            if (_shardable_axis(am, cfg.data_axis, n) is not None
                    or _shardable_axis(am, cfg.model_axis, f_ch) is not None):
                route = "shard_map"
            elif jax.device_count() == 1 or cfg.fused_bwd == "on":
                route = "direct"
        if route is not None:
            with_dx = fourier_dx_ok and cfg.fused_dx == "on"
            # dx from the same kernel: the in-VMEM phase factors serve both
            # the unit-grad gather and the input-grad f-contraction (no HBM
            # phi read for dx at all)
            gy_blur = (_blur(cfg, gy, sigma_value, "error") if with_dx
                       else None)
            try:
                res = _fused_grads_call(
                    cfg, route, gather, xb, gy_for_params, mu13, mu23,
                    gy_blur, w3m.astype(xb.dtype) if with_dx else None)
                if with_dx:
                    grads, dx = res
                    dx = dx.astype(x.dtype)
                else:
                    grads = res
            except FusedPlanError:  # no VMEM plan for this shape
                grads = None
        _log.info(
            "dau bwd %dx%d S=%d F=%d B=%d: %s",
            h, w_sp, s_ch, f_ch, p1_ * rb_,
            ("unfused spectral gather" if grads is None else
             f"fused kernel (route={route}, gather={gather}, "
             f"dx={'fused' if dx is not None else 'separate'})"))
        if grads is None:
            grads = fourier_engine.fourier_unit_grads(
                xb, gy_for_params, mu13, mu23, cfg.synth_kernel_size,
                cfg.use_interpolation, precision=cfg.lax_precision)
    else:
        table = xla_engine.grad_tables(xb, gy_for_params, cfg.synth_kernel_size,
                                       precision=cfg.lax_precision)
        grads = xla_engine.tap_gather(table, mu13, mu23, cfg.synth_kernel_size,
                                      cfg.use_interpolation)  # (M, S, G, F)

    if dx is None:
        if fourier_dx_ok:
            from . import fourier_engine
            gy_blur = _blur(cfg, gy, sigma_value, "error")
            dx = fourier_engine.fourier_input_grad(
                gy_blur, phi, cfg.synth_kernel_size,
                precision=cfg.lax_precision)
        else:
            dx = _blur_and_aggregate(
                cfg, gy, sigma_value,
                jnp.transpose(w3m, (2, 1, 0)),
                -jnp.transpose(mu13, (2, 1, 0)),
                -jnp.transpose(mu23, (2, 1, 0)),
                blur_name="error",
            )

    lr = jnp.asarray(cfg.mu_learning_rate_factor, grads.dtype)
    dw = grads[0]
    dmu1 = grads[1] * w3m * lr
    dmu2 = grads[2] * w3m * lr
    if cfg.nan_guard_mu_grads:
        # reference finalize: NaN -> 0 on mu grads only
        # (base_dau_conv_layer.cu:354-356; lr multiply preserves 0/NaN, so
        # guarding after it is equivalent to the reference's before-lr order)
        dmu1 = dmath.clip_nan(dmu1)
        dmu2 = dmath.clip_nan(dmu2)
    if cfg.compute_sigma_grad:
        dsigma_full = grads[3] * w3m
    else:
        dsigma_full = jnp.zeros_like(w3)

    if mask is not None:
        # Ignored dummy units receive no gradient (reference zeroes them,
        # base_dau_conv_layer.cu:349-353); mu/sigma grads are already zero
        # via the masked w multiplication.
        dw = dw * mask

    if had_lead:
        dw, dmu1, dmu2, dsigma_full = (a[None] for a in (dw, dmu1, dmu2, dsigma_full))
    dsigma = _reduce_to_shape(dsigma_full, sigma.shape)
    return (dx.astype(x.dtype), dw.astype(w.dtype), dmu1.astype(mu1.dtype),
            dmu2.astype(mu2.dtype), dsigma.astype(sigma.dtype))


dau_conv2d_op.defvjp(_fwd_rule, _bwd_rule)
