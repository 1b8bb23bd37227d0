"""Per-stage timing breakdown on the watercube benchmark field — the
FINE_GRAINED_TIMING equivalent (kernel_wrapper.cu:390-416,1299-1352)."""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import (
    BeamInputs, DoseEngine, compute_beam_dose, first_larger_ordered,
)
from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu.physics.interp import interp_at_index, interp_decimal_index
from raytracedicom_tpu.ops import idd_sigma as isig
from raytracedicom_tpu.ops import spot_conv, trace, transfer
from raytracedicom_tpu.ops.pallas_superposition import (
    step_radii, superpose_pallas,
)
from raytracedicom_tpu.profiling import StageTimer
from raytracedicom_tpu import plan

tables = load_physics_tables(water_cube=True)
ct_np, _ = plan.watercube_ct()
beam = plan.watercube_beam(tables)
cfg = EngineConfig()
eng = DoseEngine(tables, cfg)
st = eng.beam_static(beam, ct_np.shape)
tabs = eng.table_arrays
ct = jnp.asarray(ct_np)
grid = st.grid
S, W = beam.steps, st.z_window
nrx, nry = grid.ray_dims
max_r = max(st.radii)
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
li = -1   # deepest layer
layer = isig.LayerScalars(
    eidx[li], scalef[li], peaks[li],
    jnp.clip(after[li] - z0, 0, W).astype(jnp.int32),
    2.0 * a[li] * geom.delta_z * geom.corner_z + b[li] * geom.delta_z,
    a[li] * geom.delta_z ** 2, es[li, 0] ** 2)

fill = T.time("K2 fill (1 layer)", lambda d, c: isig.fill_idd_and_sigma(
    d, c, rw[li], tr.first_inside - z0, tr.first_outside - z0, bfi - z0,
    layer, geom_w, tabs.cidd, tabs.rrl, tabs.rrl_scale,
    r_rl=r_rl, first_step_abs=bfi), dens_w, csp_w)

rads = step_radii(fill.r_sigma_eff, 3.0, max_r)
bev = T.time("K5 superposition (1 layer)", lambda i_, r_, rd: superpose_pallas(
    i_, r_, rd, max_r, st.pad), fill.idd, fill.r_sigma_eff, rads)

dose0 = jnp.zeros(ct.shape, jnp.float32)
T.time("K6 transfer (full beam)", lambda bv: transfer.transfer_bev_to_dose(
    dose0, bv, st.d2f, st.bbox_min, st.bbox_max,
    z_shift=-z0.astype(jnp.float32)), bev)

print(T.report())
print("(per-layer stages run 20x in the full field)")
