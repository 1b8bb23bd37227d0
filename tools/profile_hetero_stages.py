"""Per-stage timing on the patient-like heterogeneous field + radius stats:
how much of the per-source superposition cost the per-slice radius forces vs
what per-(slice, y-tile) radii would allow."""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import (
    BeamInputs, DoseEngine, first_larger_ordered,
)
from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu.physics.interp import interp_at_index, interp_decimal_index
from raytracedicom_tpu.ops import idd_sigma as isig
from raytracedicom_tpu.ops import spot_conv, trace, transfer
from raytracedicom_tpu.ops.pallas_superposition import effective_sem_radii, superpose_pallas
from raytracedicom_tpu.profiling import StageTimer
from raytracedicom_tpu import plan

tables = load_physics_tables(water_cube=False)
ct_np, _ = plan.patient_ct()
beam = plan.watercube_beam(tables)
cfg = EngineConfig()
eng = DoseEngine(tables, cfg)
st = eng.beam_static(beam, ct_np.shape)
tabs = eng.table_arrays
ct = jnp.asarray(ct_np)
grid = st.grid
S, W = beam.steps, st.z_window
nrx, nry = grid.ray_dims
max_r = st.max_radius
print(f"ray dims {grid.ray_dims}, steps {S}, window {W}, max radius {max_r}")

T = StageTimer()
tr = T.time("K1 trace (full beam)", lambda c: trace.trace_density_and_sp(
    c, st.ray_to_im, grid.ray_dims, S, tabs.density, tabs.density_scale,
    tabs.sp, tabs.sp_scale), ct)

geom = isig.step_geometry(grid.ray_res, grid.ray_offset, st.ray_to_im.source_dist, S)
bfi = jnp.min(tr.first_inside)
wepl_min = jnp.min(tr.cumul_sp, axis=(1, 2))
eidx = interp_decimal_index(tabs.energies, jnp.asarray(beam.energies))
scalef = interp_at_index(tabs.scale_facts, eidx)
peaks = interp_at_index(tabs.peak_depths, eidx)
a, b = isig.sigma_sq_air_coefs(peaks, True)
entry_z = bfi.astype(jnp.float32) * jnp.float32(grid.ray_res[2]) + jnp.float32(grid.ray_offset[2])
es = jnp.sqrt((a * entry_z ** 2 + b * entry_z)[:, None] + jnp.asarray(beam.spot_sigmas) ** 2)
after = jnp.minimum(first_larger_ordered(wepl_min, 1.05 * peaks),
                    jnp.max(tr.first_outside)).astype(jnp.int32)

rw = T.time("K3 spot conv (all layers)", lambda w: spot_conv.spot_to_ray_weights(
    w, es, grid.ray_dims, st.spot_delta, st.spot_offset,
    (grid.ray_res[0], grid.ray_res[1]), (grid.ray_offset[0], grid.ray_offset[1]),
    jnp.asarray([1.0, 1.0]), 3.0), jnp.asarray(beam.spot_weights))

z0 = jnp.clip(bfi, 0, S - W).astype(jnp.int32)
dens_w = jax.lax.dynamic_slice(tr.density, (z0, 0, 0), (W, nry, nrx))
csp_w = jax.lax.dynamic_slice(tr.cumul_sp, (z0, 0, 0), (W, nry, nrx))
geom_w = geom._replace(
    half_vw_sum=jax.lax.dynamic_slice(geom.half_vw_sum, (z0,), (W,)),
    step_vol=jax.lax.dynamic_slice(geom.step_vol, (z0,), (W,)))
r_rl = dens_w * isig.lut1d_fast(tabs.rrl, dens_w * tabs.rrl_scale)

fills = {}
for li in (0, 10, 19):
    layer = isig.LayerScalars(
        eidx[li], scalef[li], peaks[li],
        jnp.clip(after[li] - z0, 0, W).astype(jnp.int32),
        2.0 * a[li] * geom.delta_z * geom.corner_z + b[li] * geom.delta_z,
        a[li] * geom.delta_z ** 2, es[li, 0] ** 2)
    name = f"K2 fill (layer {li})"
    fills[li] = T.time(name, lambda d, c, l=layer, i=li: isig.fill_idd_and_sigma(
        d, c, rw[i], tr.first_inside - z0, tr.first_outside - z0, bfi - z0,
        l, geom_w, tabs.cidd, tabs.rrl, tabs.rrl_scale,
        r_rl=r_rl, first_step_abs=bfi), dens_w, csp_w)

for li, fill in fills.items():
    rads = effective_sem_radii(fill.r_sigma_eff, 3.0, max_r)
    bev = T.time(f"K5 superposition (layer {li})", lambda i_, r_, rd: superpose_pallas(
        i_, r_, rd, max_r, st.pad), fill.idd, fill.r_sigma_eff, rads)
    # radius statistics: per-slice vs per-(slice, 8-row y-tile)
    rs = np.asarray(fill.r_sigma_eff)
    idd = np.asarray(fill.idd)
    live = idd > 0
    rs_m = np.where(live, rs, np.inf)
    def radius_of(rr):
        with np.errstate(divide="ignore"):
            rd = np.where(np.isfinite(rr), (3.0 / (np.sqrt(2.0) * rr) + 0.5), -1)
        return np.clip(rd, -1, max_r).astype(int)
    slice_rad = radius_of(rs_m.min(axis=(1, 2)))
    tile_rad = radius_of(rs_m.reshape(W, nry // 8, 8, nrx).min(axis=(2, 3)))
    cost = lambda r: np.sum(np.where(r >= 0, 2.0 * (r + 1) * (2 * r + 1), 0.0) * 1.0)
    # per-slice cost counts every tile at the slice radius
    c_slice = np.sum(np.where(slice_rad >= 0, 2.0 * (slice_rad + 1) * (2 * slice_rad + 1), 0)) * (nry // 8)
    c_tile = cost(tile_rad)
    print(f"layer {li}: live slices {np.sum(slice_rad >= 0)}, slice radius "
          f"mean {slice_rad[slice_rad>=0].mean():.1f} max {slice_rad.max()}, "
          f"tile-radius mean {tile_rad[tile_rad>=0].mean():.1f}; "
          f"op ratio tile/slice = {c_tile / c_slice:.3f}")

dose0 = jnp.zeros(ct.shape, jnp.float32)
T.time("K6 transfer (full beam)", lambda bv: transfer.transfer_bev_to_dose(
    dose0, bv, st.d2f, st.bbox_min, st.bbox_max,
    z_shift=-z0.astype(jnp.float32)), bev)

print(T.report())
print("(per-layer stages run 20x in the full field)")
