"""Shared test utilities: the reference tolerance policy and config matrix."""

import numpy as np

from dau_convnet_tpu.ops import reference as oracle


def assert_matrix(mat, gt, name, rel_tolerance=0.01, scale_aware=False):
    """Reference tolerance policy (dau_conv_test.py:300-333): a pixel is
    invalid only if rel-diff > 1e-4 AND abs-diff > 1e-7; fail only if the
    mean rel-diff over invalid pixels > rel_tolerance AND > 1% of pixels are
    invalid.

    scale_aware raises the absolute floor to 3e-6 * max|gt|: spectral
    engines leave O(eps * tensor scale) FFT-cancellation residue on entries
    that are STRUCTURAL zeros in the dense formulation (e.g. units whose
    window falls entirely outside a small image at large kernel tiers) -
    rel-diff is infinite there while the numerics are exact to f32 roundoff
    of the participating magnitudes. The reference's fixed 1e-7 floor
    presumes its dense-gather GPU engine, which produces those zeros
    exactly (found by the round-3 extended fuzz, k=33 on 6-19 px images)."""
    mat = np.asarray(mat, np.float64)
    gt = np.asarray(gt, np.float64)
    assert mat.shape == gt.shape, f"{name}: shape {mat.shape} vs {gt.shape}"
    diff_abs = np.abs(mat - gt)
    diff_rel = np.nan_to_num(diff_abs / np.abs(gt + 1e-9))
    abs_floor = (max(1e-7, 3e-6 * float(np.abs(gt).max()))
                 if scale_aware else 1e-7)
    invalid = np.logical_and(diff_rel > 1e-4, diff_abs > abs_floor)
    rate = invalid.mean()
    avg = diff_rel[invalid].mean() if invalid.any() else 0.0
    assert avg <= rel_tolerance or rate <= 1e-2, (
        f"{name}: avg rel-diff {avg:.6f} over {rate * 100:.2f}% invalid pixels"
    )


def random_case(rng, N, W, H, S, F, units, max_kernel_size, max_offset_init,
                sigma=0.5, num_ignore=0):
    """Random inputs/params for a test config, reference layout [1,S,G,F]."""
    G = int(np.prod(units))
    x = rng.random((N, S, H, W)).astype(np.float32)
    w = (rng.standard_normal((1, S, G, F)) * 0.1).astype(np.float32)
    mu1 = rng.uniform(-max_offset_init, max_offset_init, (1, S, G, F)).astype(np.float32)
    mu2 = rng.uniform(-max_offset_init, max_offset_init, (1, S, G, F)).astype(np.float32)
    # layer-level clip (reference dau_conv.py:188-195)
    bound = np.floor(max_kernel_size / 2.0) - 0.01
    mu1 = np.clip(mu1, -bound, bound)
    mu2 = np.clip(mu2, -bound, bound)
    if num_ignore:
        w[:, :, G - num_ignore:, :] = 0.0
    err = rng.standard_normal((N, F, H, W)).astype(np.float32)
    return x, w, mu1, mu2, np.float32(sigma), err


def oracle_fwd_bwd(x, w, mu1, mu2, sigma, err, *, num_ignore=0,
                   use_interpolation=True, single_dim=False,
                   forbid_positive=False, unit_testing=True, blur_size=9):
    fwd = oracle.forward(
        x, w, mu1, mu2, [float(sigma)], num_dau_units_ignore=num_ignore,
        single_dim_kernel=single_dim, aggr_forbid_positive=forbid_positive,
        use_interpolation=use_interpolation, blur_size=blur_size)
    bwd = oracle.backward(
        x, err, w, mu1, mu2, [float(sigma)], num_dau_units_ignore=num_ignore,
        unit_testing=unit_testing, single_dim_kernel=single_dim,
        aggr_forbid_positive=forbid_positive,
        use_interpolation=use_interpolation, blur_size=blur_size)
    return fwd, bwd
