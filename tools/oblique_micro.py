#!/usr/bin/env python
"""Microbenchmark the general-angle gather at watercube K1 scale on TPU.

Watercube bench geometry rotated to gantry/couch angles: 256^3 CT,
(512, 128, 128) trace lattice. Compares the band-walk Pallas kernel
against the XLA scalar-gather fallback (the path VERDICT r4 priced at
~141 ms per slab) and prints per-plan statistics.

Usage: python tools/oblique_micro.py [gantry] [couch]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from raytracedicom_tpu import plan as planmod
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.engine import precompute_beam_static
    from raytracedicom_tpu.ops import trace
    from raytracedicom_tpu.ops.pallas_gather3d import (
        oblique_gather, pack_lattice_coords_jnp, unpack_lattice_rows,
    )
    from raytracedicom_tpu.physics.tables import load_physics_tables

    gantry = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    couch = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0

    tables = load_physics_tables(water_cube=True)
    ct_np, i2w = planmod.watercube_ct()
    beam = planmod.watercube_beam(tables)
    beam = planmod.rotate_beam(beam, gantry, couch, i2w, ct_np.shape,
                               steps=512)
    static = precompute_beam_static(beam, tables, EngineConfig(),
                                    ct_np.shape, ct_shape=ct_np.shape)
    t = static.ray_to_im
    ray_dims, steps = static.grid.ray_dims, beam.steps
    print(f"angles {gantry}/{couch} ray_dims {ray_dims} steps {steps} "
          f"z_window {static.z_window}")

    t0 = time.time()
    obl = trace.oblique_trace_plan(t, ray_dims, steps, ct_np.shape)
    print(f"planning: {time.time() - t0:.2f}s")
    assert obl is not None, "no oblique plan for this geometry"
    p, info, axes = obl
    print(f"plan: perm={p.perm} tr={p.tr} wz={p.wz} wy={p.wy} wzt={p.wzt} "
          f"kw={p.kw} pairs/tile={p.pair_count()} nb={p.nb} axes={axes} "
          f"window={p.wz * p.wy * p.d2p * 4 / 2**20:.2f}MB")

    ct = jnp.asarray(ct_np)
    start, inc, _ = trace.ray_start_inc(t, ray_dims)

    @jax.jit
    def run_kernel(ct):
        tz = ct.ravel()[0] * 0
        kk = jnp.arange(steps, dtype=jnp.float32) + tz
        pos = start[None] + kk[:, None, None, None] * inc[None]
        pos = pos[..., ::-1]
        pos = jnp.transpose(pos, axes + (3,))
        c0, c1, c2 = pack_lattice_coords_jnp(pos, info, p.perm)
        rows = oblique_gather(jnp.transpose(ct, p.perm), c0, c1, c2, p)
        return jnp.transpose(unpack_lattice_rows(rows, info),
                             tuple(np.argsort(axes)))

    out = run_kernel(ct)
    v = float(jnp.max(out))
    print(f"kernel warm, max={v:.1f}")
    ts = []
    for _ in range(5):
        a = time.perf_counter()
        float(jnp.max(run_kernel(ct)))
        ts.append((time.perf_counter() - a) * 1e3)
    print(f"kernel wall ms: {[round(x, 1) for x in ts]}")

    # parity vs the XLA fallback on a depth slab (full fallback is seconds)
    @jax.jit
    def run_ref_slab(ct):
        kk = jnp.arange(128, dtype=jnp.float32) + 192.0
        pos = start[None] + kk[:, None, None, None] * inc[None]
        from raytracedicom_tpu.physics.interp import trilinear_border
        return trilinear_border(ct, pos)

    ref = run_ref_slab(ct)
    a = time.perf_counter()
    ref = jax.block_until_ready(run_ref_slab(ct))
    float(jnp.max(ref))
    print(f"fallback slab (128 of {steps} steps) wall ms: "
          f"{(time.perf_counter() - a) * 1e3:.1f}")
    err = float(jnp.max(jnp.abs(out[192:320] - ref)))
    print(f"kernel vs fallback slab max err: {err:.3e}")
    assert err < 2e-3, "kernel/fallback mismatch"  # f32 rounding at HU~1000 scale
    print("OK")


if __name__ == "__main__":
    main()
