"""MXU banded-matmul superposition path (uniform-sigma slices) vs the
per-source reference implementation, and the adaptive runtime dispatch.

The MXU form is exact when all live rays in a slice share one r_sigma_eff
(kernelSuperposition semantics, kernel_wrapper.cuh:432-489, with the
per-source weights degenerating to per-slice weights)."""
import numpy as np
import jax
import jax.numpy as jnp

from raytracedicom_tpu.ops.pallas_superposition import (
    effective_sem_radii, superpose_adaptive, superpose_masked_jnp,
)
from raytracedicom_tpu.ops.superposition import (
    slice_uniform_rs, superpose_uniform_mxu,
)

RADIUS, PAD = 5, 8


def _uniform_case(seed=0, S=7, Y=24, X=16):
    rng = np.random.RandomState(seed)
    idd = rng.uniform(0.0, 2.0, (S, Y, X)).astype(np.float32)
    idd[idd < 0.4] = 0.0                       # dead rays
    idd[2] = 0.0                               # a fully dead slice
    rs_per_slice = rng.uniform(0.2, 1.5, S).astype(np.float32)
    rs = np.broadcast_to(rs_per_slice[:, None, None], (S, Y, X)).copy()
    # dead rays carry garbage/BIG sigma, which must not matter
    rs[idd == 0.0] = 1e10
    rs[2] = 1e10
    return jnp.asarray(idd), jnp.asarray(rs)


def test_mxu_matches_per_source_on_uniform_slices():
    idd, rs = _uniform_case()
    rads = effective_sem_radii(rs, 3.0, RADIUS)
    want = np.asarray(superpose_masked_jnp(idd, rs, rads, RADIUS, PAD))
    rs_slice, all_uniform = slice_uniform_rs(idd, rs)
    assert bool(all_uniform)
    got = np.asarray(superpose_uniform_mxu(idd, rs_slice, rads.max(axis=(1, 2)),
                                           RADIUS, PAD))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6 * want.max())


def test_adaptive_dispatch_uniform_and_general():
    idd, rs = _uniform_case(seed=1)
    rads = effective_sem_radii(rs, 3.0, RADIUS)
    want = np.asarray(superpose_masked_jnp(idd, rs, rads, RADIUS, PAD))
    got = np.asarray(jax.jit(
        lambda a, b: superpose_adaptive(a, b, rads, RADIUS, PAD))(idd, rs))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6 * want.max())

    # perturb one live ray's sigma -> general branch must be taken and stay
    # exactly the per-source computation
    rs_het = rs.at[3, 5, 5].mul(1.5)
    _, uni = slice_uniform_rs(idd, rs_het)
    assert not bool(uni)
    rads_h = effective_sem_radii(rs_het, 3.0, RADIUS)
    want_h = np.asarray(superpose_masked_jnp(idd, rs_het, rads_h, RADIUS, PAD))
    got_h = np.asarray(jax.jit(
        lambda a, b: superpose_adaptive(a, b, rads_h, RADIUS, PAD))(idd, rs_het))
    np.testing.assert_allclose(got_h, want_h, rtol=2e-6,
                               atol=1e-6 * want_h.max())


def _hetero_case(seed=4, S=5, Y=16, X=64):
    rng = np.random.RandomState(seed)
    idd = rng.uniform(0.0, 2.0, (S, Y, X)).astype(np.float32)
    idd[idd < 0.3] = 0.0
    rs = rng.uniform(0.15, 1.6, (S, Y, X)).astype(np.float32)
    rs[idd == 0.0] = 1e10
    idd[1] = 0.0
    rs[1] = 1e10                                   # a fully dead slice
    return jnp.asarray(idd), jnp.asarray(rs)


def test_kernel_interpret_matches_mirror():
    """The bucketed Pallas forward kernel vs the jnp mirror through the TPU
    interpreter — CPU-testable guard for kernel restructures (the on-TPU
    agreement is additionally a committed artifact,
    tools/pallas_adjoint_check.out)."""
    from jax.experimental.pallas import tpu as pltpu
    from raytracedicom_tpu.ops.pallas_superposition import (
        superpose_bwd_pallas, superpose_pallas_raw,
    )
    idd, rs = _hetero_case()
    rads = effective_sem_radii(rs, 3.0, RADIUS)
    want = np.asarray(superpose_masked_jnp(idd, rs, rads, RADIUS, PAD))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(superpose_pallas_raw(idd, rs, rads, RADIUS, PAD))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6 * want.max())

    g = jnp.asarray(np.random.RandomState(9).uniform(
        -1, 1, want.shape).astype(np.float32))
    wi_ref, wr_ref = jax.vjp(
        lambda a, b: superpose_masked_jnp(a, b, rads, RADIUS, PAD), idd, rs
    )[1](g)
    with pltpu.force_tpu_interpret_mode():
        gi, gr = superpose_bwd_pallas(idd, rs, g, rads, RADIUS, PAD)
    np.testing.assert_allclose(
        np.asarray(gi), np.asarray(wi_ref), rtol=1e-5,
        atol=1e-5 * float(jnp.abs(wi_ref).max()))
    np.testing.assert_allclose(
        np.asarray(gr), np.asarray(wr_ref), rtol=1e-4,
        atol=1e-5 * float(jnp.abs(wr_ref).max() + 1e-30))


def test_adaptive_gradients_are_per_source_on_uniform_input():
    """Even when the MXU branch computes the primal, the VJP must be the
    per-source adjoint (each ray's own d w/d rs), not the gradient of the
    slice-reduced surrogate."""
    idd, rs = _uniform_case(seed=2, S=4, Y=12, X=10)
    rads = effective_sem_radii(rs, 3.0, RADIUS)
    g = jnp.asarray(np.random.RandomState(3).uniform(
        -1, 1, (4, 12 + 2 * PAD, 10 + 2 * PAD)).astype(np.float32))

    def loss_adaptive(a, b):
        return jnp.vdot(superpose_adaptive(a, b, rads, RADIUS, PAD), g)

    def loss_ref(a, b):
        return jnp.vdot(superpose_masked_jnp(a, b, rads, RADIUS, PAD), g)

    gi, gr = jax.grad(loss_adaptive, argnums=(0, 1))(idd, rs)
    wi, wr = jax.grad(loss_ref, argnums=(0, 1))(idd, rs)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), rtol=1e-5,
                               atol=1e-6 * float(jnp.abs(wi).max()))
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr), rtol=1e-5,
                               atol=1e-6 * float(jnp.abs(wr).max() + 1e-30))
