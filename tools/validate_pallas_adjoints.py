"""TPU validation artifact for the hand-written Pallas kernels and adjoints:
runs each kernel against its jnp mirror ON REAL TPU HARDWARE and prints max
relative errors. Commit the output (tools/pallas_adjoint_check.out) so the
agreement is a reproducible artifact, not commit-message lore.

Usage: python tools/validate_pallas_adjoints.py [> tools/pallas_adjoint_check.out]
"""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))


def check_superposition(lines):
    import raytracedicom_tpu.ops.pallas_superposition as ps

    rng = np.random.default_rng(0)
    for (S, Y, X, max_r, pad) in [(12, 64, 32, 6, 8), (7, 48, 40, 11, 16),
                                  (24, 128, 128, 16, 32)]:
        idd = rng.uniform(0, 1, (S, Y, X)).astype(np.float32)
        dead = rng.uniform(0, 1, (S, Y, X)) < 0.3
        rs = (0.15 + rng.uniform(0, 1.2, (S, Y, X))).astype(np.float32)
        rs = np.where(dead, 1e10, rs).astype(np.float32)
        idd = np.where(dead, 0.0, idd).astype(np.float32)
        idd, rs = jnp.asarray(idd), jnp.asarray(rs)
        rad = ps.effective_sem_radii(rs, 3.0, max_r)

        fwd_k = jax.jit(lambda a, b, r: ps.superpose_pallas_raw(a, b, r, max_r, pad))
        fwd_m = jax.jit(lambda a, b, r: ps.superpose_masked_jnp(a, b, r, max_r, pad))
        e_fwd = rel(fwd_k(idd, rs, rad), fwd_m(idd, rs, rad))

        g = jnp.asarray(rng.uniform(0, 1, (S, Y + 2 * pad, X + 2 * pad))
                        .astype(np.float32))
        bwd_k = jax.jit(lambda a, b, gg, r: ps.superpose_bwd_pallas(
            a, b, gg, r, max_r, pad))
        gd, grs = bwd_k(idd, rs, g, rad)
        _, vjp = jax.vjp(lambda a, b: ps.superpose_masked_jnp(
            a, b, rad, max_r, pad), idd, rs)
        wgd, wgrs = vjp(g)
        lines.append(f"superpose S{S} Y{Y} X{X} r{max_r}: "
                     f"fwd {e_fwd:.2e}  bwd g_idd {rel(gd, wgd):.2e}  "
                     f"g_rs {rel(grs, wgrs):.2e}")
        assert e_fwd < 5e-5 and rel(gd, wgd) < 5e-5 and rel(grs, wgrs) < 1e-4


def check_tent_transpose(lines):
    from raytracedicom_tpu.ops.resample import (
        _row_tent_jnp, _row_tent_pallas, tent_taps,
    )
    rng = np.random.default_rng(1)
    for (R, I, n_out) in [(64, 192, 128), (37, 130, 41), (256, 96, 256)]:
        scale = n_out / (I * 1.07)
        a = 1.0 / scale
        b = rng.uniform(-2.0, 2.0, (R, 1)).astype(np.float32)
        coords = (a * np.arange(I, dtype=np.float32)[None] + b).astype(np.float32)
        g = rng.uniform(-1, 1, (R, I)).astype(np.float32)
        taps = tent_taps(scale)
        got = jax.jit(lambda gg, cc: _row_tent_pallas(gg, cc, n_out, taps))(
            jnp.asarray(g), jnp.asarray(coords))
        want = _row_tent_jnp(jnp.asarray(g), jnp.asarray(coords), n_out, taps)
        lines.append(f"row_tent R{R} I{I} out{n_out} taps{taps}: "
                     f"{rel(got, want):.2e}")
        assert rel(got, want) < 1e-5


def check_lut(lines):
    from raytracedicom_tpu.ops.pallas_lut import lut_interp
    from raytracedicom_tpu.physics.interp import lut1d
    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.uniform(-1, 2, 3072).astype(np.float32))
    c = jnp.asarray(rng.uniform(-10, 3090, (257, 130)).astype(np.float32))
    got = jax.jit(lut_interp)(tab, c)
    want = lut1d(tab, c)
    g = jnp.asarray(rng.uniform(-1, 1, c.shape).astype(np.float32))
    _, vk = jax.vjp(lut_interp, tab, c)
    _, vm = jax.vjp(lut1d, tab, c)
    (kt, kc), (mt, mc) = vk(g), vm(g)
    lines.append(f"lut1d 3072: fwd {rel(got, want):.2e}  "
                 f"bwd d_table {rel(kt, mt):.2e}  d_coord {rel(kc, mc):.2e}")
    assert rel(got, want) < 1e-6 and rel(kc, mc) < 1e-5


def check_fused_scan(lines):
    import raytracedicom_tpu.ops.pallas_scan as psc
    rng = np.random.default_rng(3)
    S, Y, X = 264, 128, 128
    t = jnp.asarray(rng.standard_normal((S, Y, X)).astype(np.float32))
    pd = jnp.asarray(rng.uniform(0, 1, (S, Y, X)).astype(np.float32))
    u = jnp.asarray((rng.uniform(0, 1, (S, Y, X)) < 0.6).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, S, Y, X)).astype(np.float32))
    val = (rng.uniform(0, 1, (S, Y, X)) < 0.5).astype(np.float32)
    val[0] = 1.0
    val = jnp.asarray(val)
    want = jax.jit(
        lambda a, b, c: psc.fused_depth_scans_jnp(a, b, u, c, val))(t, pd, v)
    got = jax.jit(
        lambda a, b, c: psc._fused_fwd_pallas(a, b, u, c, val))(t, pd, v)
    e_fwd = max(rel(a, b) for a, b in zip(got, want))
    gs = tuple(jnp.asarray(rng.standard_normal((S, Y, X)).astype(np.float32))
               for _ in range(4))
    gv = jnp.asarray(rng.standard_normal((2, S, Y, X)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda a, b, c: psc.fused_depth_scans_jnp(a, b, u, c, val), t, pd, v)
    rt, rpd, rv = vjp(gs + (jnp.zeros_like(t), jnp.zeros_like(t), gv))
    gt, gpd, gvv = jax.jit(psc._fused_bwd_pallas)(u, val, *gs, gv)
    lines.append(f"fused_depth_scans S{S}: fwd {e_fwd:.2e}  "
                 f"bwd g_t {rel(gt, rt):.2e}  g_pd {rel(gpd, rpd):.2e}  "
                 f"g_v {rel(gvv, rv):.2e}")
    assert (e_fwd < 1e-5 and rel(gt, rt) < 1e-5 and rel(gpd, rpd) < 1e-5
            and rel(gvv, rv) < 1e-5)


def check_fused_trace_tail(lines):
    import raytracedicom_tpu.ops.pallas_trace as pt
    rng = np.random.default_rng(4)
    for (S, J, D2, I) in [(264, 128, 256, 128), (37, 24, 96, 72)]:
        B = jnp.asarray(rng.uniform(0, 2000, (S, J, D2)).astype(np.float32))
        c2 = jnp.asarray(rng.uniform(-3, D2 + 2, (S, I)).astype(np.float32))
        sl = jnp.asarray(rng.uniform(0.9, 1.2, (J, I)).astype(np.float32))
        dlut = jnp.asarray(np.cumsum(rng.uniform(0, 1, 300)).astype(np.float32))
        slut = jnp.asarray(np.cumsum(rng.uniform(0, 1, 170)).astype(np.float32))
        ds, ss = jnp.float32(0.12), jnp.float32(0.05)
        want = jax.jit(lambda *a: pt._tail_jnp(*a, 150.0))(
            B, c2, sl, dlut, ds, slut, ss)
        got = jax.jit(lambda *a: pt.fused_trace_tail_pallas(*a, 150.0))(
            B, c2, sl, dlut, ds, slut, ss)
        e_den, e_csp = rel(got[0], want[0]), rel(got[1], want[1])
        fi_ok = bool((np.asarray(got[2]) == np.asarray(want[2])).all())
        fo_ok = bool((np.asarray(got[3]) == np.asarray(want[3])).all())
        lines.append(f"fused_trace_tail S{S} J{J} D2{D2}: den {e_den:.2e}  "
                     f"cumsp {e_csp:.2e}  fi=={fi_ok} fo=={fo_ok}")
        assert e_den < 1e-5 and e_csp < 1e-5 and fi_ok and fo_ok


def main():
    backend = jax.default_backend()
    dev = jax.devices()[0]
    lines = [f"pallas adjoint validation — backend={backend} device={dev.device_kind}"]
    if backend not in ("tpu", "axon"):
        lines.append("NOT ON TPU — kernels fall back to jnp mirrors; rerun on hardware")
    check_superposition(lines)
    check_tent_transpose(lines)
    check_lut(lines)
    check_fused_scan(lines)
    check_fused_trace_tail(lines)
    lines.append("all checks passed")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
