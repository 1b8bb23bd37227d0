import numpy as np
import jax.numpy as jnp

from raytracedicom_tpu.geometry import transforms as T


def _rand_affine(rng):
    m = rng.standard_normal((3, 3)).astype(np.float32) + 3 * np.eye(3, dtype=np.float32)
    v = rng.standard_normal(3).astype(np.float32)
    return T.AffineTransform(jnp.asarray(m), jnp.asarray(v))


def test_affine_inverse_roundtrip():
    rng = np.random.default_rng(0)
    t = _rand_affine(rng)
    p = jnp.asarray(rng.standard_normal((17, 3)).astype(np.float32))
    q = T.apply_affine(T.invert_affine(t), T.apply_affine(t, p))
    np.testing.assert_allclose(q, p, atol=1e-4)


def test_affine_concat_matches_sequential():
    rng = np.random.default_rng(1)
    t1, t2 = _rand_affine(rng), _rand_affine(rng)
    p = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    seq = T.apply_affine(t2, T.apply_affine(t1, p))
    cat = T.apply_affine(T.concat_affine(t1, t2), p)
    np.testing.assert_allclose(cat, seq, rtol=1e-5, atol=1e-5)


def test_idx_inverse_roundtrip():
    t = T.IdxTransform(jnp.asarray([3.0, 3.0, -1.0]), jnp.asarray([-48.0, -48.0, 128.0]))
    p = jnp.asarray([[1.0, 2.0, 3.0], [-4.0, 0.5, 10.0]])
    q = T.apply_idx(T.invert_idx(t), T.apply_idx(t, p))
    np.testing.assert_allclose(q, p, atol=1e-4)


def test_fan_roundtrip_divergent():
    rng = np.random.default_rng(2)
    fit = T.IdxTransform(jnp.asarray([3.0, 3.0, -1.0]), jnp.asarray([-48.0, -48.0, 128.0]))
    gtii = _rand_affine(rng)
    src = jnp.asarray([1000.0, 1500.0])
    fwd = T.FanFromIdxTransform(fit, src, gtii)
    inv = T.invert_fan_from_idx(fwd)
    p = jnp.asarray(rng.uniform(0, 30, (50, 3)).astype(np.float32))
    q = T.apply_fan_to_idx(inv, T.apply_fan_from_idx(fwd, p))
    np.testing.assert_allclose(q, p, rtol=2e-4, atol=2e-3)


def test_fan_parallel_infinite_source():
    fit = T.IdxTransform(jnp.asarray([3.0, 3.0, -1.0]), jnp.asarray([-48.0, -48.0, 128.0]))
    gtii = T.AffineTransform.identity()
    inf = float("inf")
    fwd = T.FanFromIdxTransform(fit, jnp.asarray([inf, inf]), gtii)
    p = jnp.asarray([[4.0, 7.0, 100.0]])
    out = T.apply_fan_from_idx(fwd, p)
    np.testing.assert_allclose(out, [[4 * 3 - 48, 7 * 3 - 48, 128 - 100]], atol=1e-5)


def test_invert_and_shift():
    fit = T.IdxTransform(jnp.asarray([1.0, 1.0, -1.0]), jnp.asarray([-63.0, -63.0, 128.0]))
    fwd = T.FanFromIdxTransform(fit, jnp.asarray([jnp.inf, jnp.inf]), T.AffineTransform.identity())
    shifted = T.invert_and_shift_fan_from_idx(fwd, jnp.asarray([32.0, 32.0, 0.0]))
    p = jnp.asarray([[5.0, 6.0, 40.0]])
    plain = T.apply_fan_to_idx(T.invert_fan_from_idx(fwd), p)
    shift = T.apply_fan_to_idx(shifted, p)
    np.testing.assert_allclose(shift - plain, [[32.0, 32.0, 0.0]], atol=1e-5)
