import numpy as np
import jax.numpy as jnp

from raytracedicom_tpu.physics import interp as I


def test_lut1d_matches_numpy_interp():
    table = jnp.asarray(np.cumsum(np.random.default_rng(0).uniform(size=64)).astype(np.float32))
    coords = jnp.asarray(np.linspace(-2, 66, 200, dtype=np.float32))
    got = I.lut1d(table, coords)
    want = np.interp(np.clip(coords, 0, 63), np.arange(64), np.asarray(table))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lut2d_clamps_and_interps():
    t = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    assert float(I.lut2d(t, jnp.float32(1.5), jnp.float32(0.0))) == 1.5
    assert float(I.lut2d(t, jnp.float32(0.0), jnp.float32(1.5))) == 6.0
    assert float(I.lut2d(t, jnp.float32(-3.0), jnp.float32(10.0))) == 8.0


def test_trilinear_border_zero_outside():
    vol = jnp.ones((4, 5, 6), jnp.float32)
    pos = jnp.asarray([[2.0, 2.0, 1.0], [-1.1, 2.0, 1.0], [2.0, 2.0, 3.5]])
    out = I.trilinear_border(vol, pos)
    np.testing.assert_allclose(out, [1.0, 0.0, 0.5], atol=1e-6)


def test_trilinear_matches_manual():
    rng = np.random.default_rng(3)
    vol = rng.uniform(size=(5, 6, 7)).astype(np.float32)
    x, y, z = 2.3, 1.7, 3.2
    x0, y0, z0 = 2, 1, 3
    fx, fy, fz = x - x0, y - y0, z - z0
    want = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy) * (fz if dz else 1 - fz))
                want += w * vol[z0 + dz, y0 + dy, x0 + dx]
    got = I.trilinear_border(jnp.asarray(vol), jnp.asarray([[x, y, z]]))
    np.testing.assert_allclose(got[0], want, rtol=1e-5)


def test_decimal_index_roundtrip():
    ordered = jnp.asarray([10.0, 20.0, 40.0, 80.0])
    vals = jnp.asarray([5.0, 10.0, 15.0, 30.0, 80.0, 100.0])
    got = I.interp_decimal_index(ordered, vals)
    np.testing.assert_allclose(got, [0.0, 0.0, 0.5, 1.5, 3.0, 3.0], atol=1e-6)
    back = I.interp_at_index(ordered, got[2])
    np.testing.assert_allclose(back, 15.0, atol=1e-5)
