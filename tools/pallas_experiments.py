"""Feasibility experiments: what gather forms does Mosaic lower efficiently?"""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from raytracedicom_tpu.profiling import StageTimer

S, Y, X = 512, 128, 128
key = jax.random.PRNGKey(0)
coords = jax.random.uniform(key, (S, Y, X), jnp.float32) * 3070.0
table = jnp.linspace(0.0, 1.0, 3072, dtype=jnp.float32)

# --- Experiment 1: 1D LUT interp inside pallas, table in VMEM ---
def lut_kernel(table_ref, coord_ref, out_ref):
    c = coord_ref[:]
    n = table_ref.shape[0]
    c = jnp.clip(c, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    f = c - i0.astype(c.dtype)
    t = table_ref[:]
    t0 = jnp.take(t, i0.reshape(-1)).reshape(c.shape)
    t1 = jnp.take(t, (i0 + 1).reshape(-1)).reshape(c.shape)
    out_ref[:] = t0 + (t1 - t0) * f

@jax.jit
def lut_pallas(table, coords):
    CZ = 16
    return pl.pallas_call(
        lut_kernel,
        out_shape=jax.ShapeDtypeStruct(coords.shape, coords.dtype),
        grid=(S // CZ,),
        in_specs=[
            pl.BlockSpec((3072,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CZ, Y, X), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CZ, Y, X), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(table, coords)

try:
    out = lut_pallas(table, coords)
    ref = jnp.interp(coords, jnp.arange(3072.0), table)
    print("lut ok, err", float(jnp.max(jnp.abs(out - ref))))
    T = StageTimer()
    T.time("pallas lut1d", lut_pallas, table, coords)
    print(T.report())
except Exception as e:
    print("LUT EXPERIMENT FAILED:", type(e).__name__, str(e)[:500])

# --- Experiment 2: trilinear gather from a VMEM slab ---
slab = jax.random.uniform(key, (16, 192, 192), jnp.float32)
pos = jax.random.uniform(key, (8, Y, X, 3), jnp.float32) * 14.0

def tri_kernel(slab_ref, pos_ref, out_ref):
    sz, sy, sx = slab_ref.shape
    p = pos_ref[:]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    x0 = jnp.floor(x).astype(jnp.int32); fx = x - x0.astype(x.dtype)
    y0 = jnp.floor(y).astype(jnp.int32); fy = y - y0.astype(y.dtype)
    z0 = jnp.floor(z).astype(jnp.int32); fz = z - z0.astype(z.dtype)
    s = slab_ref[:]
    flat = s.reshape(-1)
    def corner(dz, dy, dx):
        zi = jnp.clip(z0 + dz, 0, sz - 1)
        yi = jnp.clip(y0 + dy, 0, sy - 1)
        xi = jnp.clip(x0 + dx, 0, sx - 1)
        idx = (zi * sy + yi) * sx + xi
        return jnp.take(flat, idx.reshape(-1)).reshape(x.shape)
    wx0, wy0, wz0 = 1 - fx, 1 - fy, 1 - fz
    out_ref[:] = (
        wz0 * (wy0 * (wx0 * corner(0,0,0) + fx * corner(0,0,1))
               + fy * (wx0 * corner(0,1,0) + fx * corner(0,1,1)))
        + fz * (wy0 * (wx0 * corner(1,0,0) + fx * corner(1,0,1))
                + fy * (wx0 * corner(1,1,0) + fx * corner(1,1,1))))

@jax.jit
def tri_pallas(slab, pos):
    return pl.pallas_call(
        tri_kernel,
        out_shape=jax.ShapeDtypeStruct(pos.shape[:-1], jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(slab, pos)

try:
    out = tri_pallas(slab, pos)
    from raytracedicom_tpu.physics.interp import trilinear_border
    ref = trilinear_border(slab, pos)
    print("tri ok, err", float(jnp.max(jnp.abs(out - ref))))
    T = StageTimer()
    T.time("pallas trilinear slab (8,128,128)", tri_pallas, slab, pos)
    print(T.report())
except Exception as e:
    print("TRI EXPERIMENT FAILED:", type(e).__name__, str(e)[:800])
