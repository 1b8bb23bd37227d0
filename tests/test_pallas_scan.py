"""Fused depth-recurrence scan (ops/pallas_scan.py): the Pallas kernels vs
the jnp cumsum + associative-scan mirror, via the TPU interpreter so the
in-kernel carry logic is CPU-testable; plus the hand-derived reverse-sweep
VJP (incl. the forward-fill channels) vs jax.vjp of the mirror."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import raytracedicom_tpu.ops.pallas_scan as psc


def _case(seed, S, Y, X, C=2):
    rng = np.random.RandomState(seed)
    t = jnp.asarray(rng.randn(S, Y, X).astype(np.float32))
    pd = jnp.asarray(rng.rand(S, Y, X).astype(np.float32))
    u = jnp.asarray((rng.rand(S, Y, X) < 0.6).astype(np.float32))
    v = jnp.asarray(rng.randn(C, S, Y, X).astype(np.float32))
    val = (rng.rand(S, Y, X) < 0.5).astype(np.float32)
    val[0] = 1.0                        # the caller's val[0] == 1 contract
    val = jnp.asarray(val)
    gs = tuple(jnp.asarray(rng.randn(S, Y, X).astype(np.float32))
               for _ in range(6))
    gv = jnp.asarray(rng.randn(C, S, Y, X).astype(np.float32))
    return t, pd, u, v, val, gs + (gv,)


@pytest.mark.parametrize("C", [1, 2])
def test_custom_vjp_matches_autodiff_of_mirror(C):
    t, pd, u, v, val, gs = _case(C, 37, 16, 24, C=C)
    _, vjp_ref = jax.vjp(
        lambda a, b, c: psc.fused_depth_scans_jnp(a, b, u, c, val), t, pd, v)
    rt, rpd, rv = vjp_ref(gs)
    _, vjp_c = jax.vjp(
        lambda a, b, c: psc.fused_depth_scans(a, b, u, c, val), t, pd, v)
    ct, cpd, cv = vjp_c(gs)
    scale = float(jnp.abs(rt).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(ct), np.asarray(rt),
                               rtol=1e-5, atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(cpd), np.asarray(rpd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(rv),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,Y,X", [(37, 16, 24), (64, 8, 128), (13, 24, 40)])
def test_pallas_kernels_match_mirror_interpret(S, Y, X):
    from jax.experimental.pallas import tpu as pltpu
    t, pd, u, v, val, gs = _case(S + Y, S, Y, X)
    want = psc.fused_depth_scans_jnp(t, pd, u, v, val)
    with pltpu.force_tpu_interpret_mode():
        got = psc._fused_fwd_pallas(t, pd, u, v, val)
    for i, (a, b) in enumerate(zip(got, want)):
        scale = float(jnp.abs(b).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5 * scale, err_msg=f"output {i}")

    _, vjp_ref = jax.vjp(
        lambda a, b, c: psc.fused_depth_scans_jnp(a, b, u, c, val), t, pd, v)
    rt, rpd, rv = vjp_ref(gs)
    with pltpu.force_tpu_interpret_mode():
        gt, gpd, gv = psc._fused_bwd_pallas(u, val, gs[0], gs[1], gs[2],
                                            gs[3], gs[6])
    scale = float(jnp.abs(rt).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt), rtol=1e-5,
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(gpd), np.asarray(rpd), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-5,
                               atol=1e-5)
