"""Pallas kernels vs the XLA engine and the oracle (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dau_convnet_tpu.kernels import (
    aggregate_forward_pallas,
    dau_forward_fused_pallas,
    grad_tables_pallas,
)
from dau_convnet_tpu.ops import DAUConvSettings, dau_conv2d_op, xla_engine
from dau_convnet_tpu.ops.gaussian import gaussian_filters

from helpers import assert_matrix, oracle_fwd_bwd, random_case


def _params(rng, S, G, F, bound):
    w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, jnp.float32)
    mu1 = jnp.asarray(rng.uniform(-bound, bound, (S, G, F)), jnp.float32)
    mu2 = jnp.asarray(rng.uniform(-bound, bound, (S, G, F)), jnp.float32)
    return w, mu1, mu2


def test_aggregate_matches_xla_engine():
    rng = np.random.default_rng(0)
    S, G, F, N, H, W, ks = 5, 2, 6, 2, 10, 12, 9
    w, mu1, mu2 = _params(rng, S, G, F, 3.5)
    xb = jnp.asarray(rng.random((N, S, H, W)), jnp.float32)

    y_pl = jax.jit(lambda *a: aggregate_forward_pallas(*a, ks))(xb, w, mu1, mu2)
    y_xla = jax.jit(lambda *a: xla_engine.aggregate_forward(*a, ks))(xb, w, mu1, mu2)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_matches_oracle():
    rng = np.random.default_rng(1)
    x, w, mu1, mu2, sigma, err = random_case(
        rng, N=2, W=12, H=10, S=3, F=4, units=(1, 2), max_kernel_size=9,
        max_offset_init=3)
    filt = gaussian_filters(jnp.float32(sigma), size=9)["w"]
    ks = DAUConvSettings(kernel_size=9).synth_kernel_size

    y = jax.jit(lambda *a: dau_forward_fused_pallas(*a, filt, ks))(
        jnp.asarray(x), jnp.asarray(w[0]), jnp.asarray(mu1[0]), jnp.asarray(mu2[0]))
    gt_fwd, _ = oracle_fwd_bwd(x, w, mu1, mu2, sigma, err, unit_testing=False)
    assert_matrix(np.asarray(y), gt_fwd, "pallas_fused_fwd")


def test_grad_tables_match_xla_engine():
    rng = np.random.default_rng(2)
    M, N, S, F, H, W, ks = 3, 2, 4, 5, 8, 9, 9
    xbk = jnp.asarray(rng.random((M, N, S, H, W)), jnp.float32)
    err = jnp.asarray(rng.standard_normal((N, F, H, W)), jnp.float32)

    t_pl = jax.jit(lambda *a: grad_tables_pallas(*a, ks))(xbk, err)
    t_xla = jax.jit(lambda *a: xla_engine.grad_tables(*a, ks))(xbk, err)
    np.testing.assert_allclose(np.asarray(t_pl), np.asarray(t_xla),
                               rtol=1e-4, atol=1e-4)


def test_pallas_engine_end_to_end_vs_oracle():
    rng = np.random.default_rng(3)
    x, w, mu1, mu2, sigma, err = random_case(
        rng, N=2, W=9, H=8, S=3, F=4, units=(1, 2), max_kernel_size=9,
        max_offset_init=3)
    cfg = DAUConvSettings(kernel_size=9, unit_testing=True, engine="pallas")
    sig = np.broadcast_to(np.float32(sigma).reshape(1, 1, 1, 1), w.shape).astype(np.float32)

    @jax.jit
    def fwd_bwd(x, w, mu1, mu2, sig, err):
        y, vjp = jax.vjp(lambda *a: dau_conv2d_op(cfg, *a), x, w, mu1, mu2, sig)
        return y, vjp(err)

    y, (dx, dw, dmu1, dmu2, dsig) = fwd_bwd(x, w, mu1, mu2, sig, jnp.asarray(err))
    gt_fwd, gt_bwd = oracle_fwd_bwd(x, w, mu1, mu2, sigma, err, unit_testing=True)

    assert_matrix(np.asarray(y), gt_fwd, "fwd_output")
    assert_matrix(np.asarray(dx), gt_bwd[0], "bwd_error")
    assert_matrix(np.asarray(dw), gt_bwd[1], "bwd_w_grad")
    assert_matrix(np.asarray(dmu1), gt_bwd[2], "bwd_mu1_grad")
    assert_matrix(np.asarray(dmu2), gt_bwd[3], "bwd_mu2_grad")
    assert_matrix(np.asarray(dsig), gt_bwd[4], "bwd_sigma_grad")


def test_pallas_fused_engine_end_to_end_vs_oracle():
    rng = np.random.default_rng(5)
    x, w, mu1, mu2, sigma, err = random_case(
        rng, N=2, W=9, H=8, S=3, F=4, units=(1, 2), max_kernel_size=9,
        max_offset_init=3)
    cfg = DAUConvSettings(kernel_size=9, unit_testing=True,
                          engine="pallas_fused")
    sig = np.broadcast_to(np.float32(sigma).reshape(1, 1, 1, 1), w.shape).astype(np.float32)

    @jax.jit
    def fwd_bwd(x, w, mu1, mu2, sig, err):
        y, vjp = jax.vjp(lambda *a: dau_conv2d_op(cfg, *a), x, w, mu1, mu2, sig)
        return y, vjp(err)

    y, (dx, dw, dmu1, dmu2, dsig) = fwd_bwd(x, w, mu1, mu2, sig, jnp.asarray(err))
    gt_fwd, gt_bwd = oracle_fwd_bwd(x, w, mu1, mu2, sigma, err, unit_testing=True)

    assert_matrix(np.asarray(y), gt_fwd, "fwd_output")
    assert_matrix(np.asarray(dx), gt_bwd[0], "bwd_error")
    assert_matrix(np.asarray(dw), gt_bwd[1], "bwd_w_grad")
    assert_matrix(np.asarray(dmu1), gt_bwd[2], "bwd_mu1_grad")
    assert_matrix(np.asarray(dmu2), gt_bwd[3], "bwd_mu2_grad")
    assert_matrix(np.asarray(dsig), gt_bwd[4], "bwd_sigma_grad")


class TestFusedSpectralBackward:
    """v2 fused backward (kernels/fused_bwd.py::fused_spectral_grads_call):
    cross-spectra + in-kernel spectral tap-gather, validated in interpret
    mode against the unfused fourier path (which the oracle matrix pins)."""

    def _case(self, S, F, HW, vmem_budget=None, G=2, gather="phi"):
        import dau_convnet_tpu.ops.fourier_engine as fe
        from dau_convnet_tpu.kernels.fused_bwd import (
            fused_spectral_grads_call)

        N, KS = 3, 9
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((N, S, HW, HW)), jnp.float32)
        err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), jnp.float32)
        mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
        mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
        xbm = jnp.stack([x, x * 0.5, -x])
        hi = jax.lax.Precision.HIGHEST
        ref = fe.fourier_unit_grads(xbm, err, mu1, mu2, KS, True,
                                    precision=hi)
        if vmem_budget is None:
            got = fe.fourier_unit_grads_fused2(xbm, err, mu1, mu2, KS, True,
                                               precision=hi, gather=gather)
        else:
            p1, p2, rb = fe.plan_bins(HW, HW, KS)
            span = KS // 2 + 1
            xre, xim = fe._rdft2(xbm, p1, p2, rb, hi)
            xs = jnp.transpose(jnp.concatenate([xre, xim], axis=1),
                               (3, 0, 1, 2))
            ere, eim = fe._rdft2(err, p1, p2, rb, hi)
            es = jnp.transpose(jnp.concatenate([ere, eim], axis=0),
                               (2, 0, 1))
            t1 = jnp.asarray(fe._phase_table_host(p1, p1, span), jnp.float32)
            w2 = np.full(rb, 2.0)
            w2[0] = 1.0
            if p2 % 2 == 0:
                w2[-1] = 1.0
            coef = np.concatenate([w2, w2])[:, None] / (p1 * p2)
            t2 = jnp.asarray(fe._phase_table_host(p2, rb, span) * coef,
                             jnp.float32)
            a1 = jnp.transpose(fe._phase_onehot(mu1, span, True),
                               (0, 2, 1, 3))
            a2 = jnp.transpose(fe._phase_onehot(mu2, span, True),
                               (0, 2, 1, 3))
            got = fused_spectral_grads_call(
                xs, es, t1, t2, a1, a2, n_img=N, p1b=p1, rbb=rb,
                vmem_budget=vmem_budget, gather=gather)
        rel = float(jnp.max(jnp.abs(ref - got))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 1e-4, rel

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_small(self, gather):
        self._case(16, 24, 13, gather=gather)

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_uneven_spatial(self, gather):
        self._case(24, 32, 27, gather=gather)

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_forced_k1_chunking(self, gather):
        # tiny budget forces n_k1 > 1: validates the cross-chunk output
        # accumulation path (phi: per-chunk grad partials; factored: the
        # in-scratch E accumulation over kc)
        self._case(24, 32, 27, vmem_budget=12 * 1024 * 1024, gather=gather)

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_g4_fori_path(self, gather):
        # G > 2 takes the in-kernel fori_loop gather (dynamic unit
        # indexing; the round-2 kernel could not compile G=4 at all)
        self._case(16, 24, 13, G=4, gather=gather)

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_g4_chunked(self, gather):
        self._case(24, 32, 27, vmem_budget=12 * 1024 * 1024, G=4,
                   gather=gather)

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_g1(self, gather):
        self._case(16, 24, 13, G=1, gather=gather)

    def _case_dx(self, S, F, HW, G=2, vmem_budget=None, gather="phi"):
        """Fused dx emission: grads AND the input-grad from one kernel
        invocation, vs the unfused conj(Phi) path."""
        import dau_convnet_tpu.ops.fourier_engine as fe

        N, KS = 3, 9
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((N, S, HW, HW)), jnp.float32)
        err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), jnp.float32)
        gyb = jnp.asarray(rng.standard_normal((N, F, HW, HW)), jnp.float32)
        mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
        mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, jnp.float32)
        xbm = jnp.stack([x, x * 0.5, -x])
        hi = jax.lax.Precision.HIGHEST
        g_ref = fe.fourier_unit_grads(xbm, err, mu1, mu2, KS, True,
                                      precision=hi)
        p1, p2, rb = fe.plan_bins(HW, HW, KS)
        phi = fe.build_phi(w, mu1, mu2, p1, p2, rb, True,
                           phase_span=KS // 2 + 1, precision=hi)
        dx_ref = fe.fourier_input_grad(gyb, phi, KS, precision=hi)
        kwargs = {} if vmem_budget is None else {"vmem_budget": vmem_budget}
        if vmem_budget is not None:
            import functools
            import dau_convnet_tpu.kernels.fused_bwd as fb
            orig = fb.fused_spectral_grads_call
            fb.fused_spectral_grads_call = functools.partial(orig, **kwargs)
            try:
                got, dx = fe.fourier_unit_grads_fused2(
                    xbm, err, mu1, mu2, KS, True, precision=hi,
                    err_blur=gyb, w_units=w, gather=gather)
            finally:
                fb.fused_spectral_grads_call = orig
        else:
            got, dx = fe.fourier_unit_grads_fused2(
                xbm, err, mu1, mu2, KS, True, precision=hi,
                err_blur=gyb, w_units=w, gather=gather)
        grel = float(jnp.max(jnp.abs(g_ref - got))
                     / (jnp.max(jnp.abs(g_ref)) + 1e-9))
        drel = float(jnp.max(jnp.abs(dx_ref - dx))
                     / (jnp.max(jnp.abs(dx_ref)) + 1e-9))
        assert grel < 1e-4, grel
        assert drel < 1e-4, drel

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_dx_fused(self, gather):
        self._case_dx(16, 24, 13, gather=gather)

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_dx_fused_g4(self, gather):
        self._case_dx(16, 24, 13, G=4, gather=gather)

    @pytest.mark.parametrize("gather", ["phi", "factored"])
    def test_dx_fused_chunked(self, gather):
        # n_k1 > 1: phi accumulates dx over the fj grid dim with per-chunk
        # grad partials; factored accumulates E over the kc grid dim with
        # the full-B dx block
        self._case_dx(24, 32, 27, vmem_budget=12 * 1024 * 1024,
                      gather=gather)


class TestFusedForward:
    """Fused fwd/dx kernel (kernels/fused_fwd.py) in interpret mode vs the
    unfused fourier chain (which the oracle matrix pins)."""

    def _case(self, S, F, HW, contract_f):
        import dau_convnet_tpu.ops.fourier_engine as fe

        N, G, KS = 3, 2, 9
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((N, S, HW, HW)), jnp.float32)
        err = jnp.asarray(rng.standard_normal((N, F, HW, HW)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((S, G, F)) * 0.1, jnp.float32)
        mu1 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
        mu2 = jnp.asarray(rng.uniform(-3, 3, (S, G, F)), jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        if contract_f:
            p1, p2, rb = fe.plan_bins(HW, HW, KS)
            phi = fe.build_phi(w, mu1, mu2, p1, p2, rb)
            ref = fe.fourier_input_grad(err, phi, KS, precision=hi)
            got = fe.fourier_apply_phi_fused(err, w, mu1, mu2, KS, True,
                                             precision=hi, contract_f=True)
        else:
            ref = fe.fourier_forward(x, w, mu1, mu2, KS, True, precision=hi)
            got = fe.fourier_apply_phi_fused(x, w, mu1, mu2, KS, True,
                                             precision=hi)
        rel = float(jnp.max(jnp.abs(ref - got))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 1e-4, rel

    def test_forward(self):
        self._case(16, 24, 13, False)

    def test_input_grad(self):
        self._case(16, 24, 13, True)

    def test_forward_uneven(self):
        self._case(24, 32, 27, False)
