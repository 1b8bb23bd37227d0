import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp, time, functools
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import *
from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu.ops import trace, spot_conv, idd_sigma as isig, superposition, transfer
from raytracedicom_tpu.profiling import StageTimer
from raytracedicom_tpu import plan

tables = load_physics_tables(water_cube=True)
ct_np, _ = plan.watercube_ct()
beam = plan.watercube_beam(tables)
cfg = EngineConfig()
st = precompute_beam_static(beam, tables, cfg, ct_np.shape)
tabs = TableArrays.from_tables(tables)
ct = jnp.asarray(ct_np)
grid = st.grid
S = beam.steps; W = st.z_window
nrx, nry = grid.ray_dims

T = StageTimer()
tr = T.time("K1 trace", lambda c: trace.trace_density_and_sp(c, st.ray_to_im, grid.ray_dims, S, tabs.density, tabs.density_scale, tabs.sp, tabs.sp_scale), ct)
print("trace done", flush=True)

geom = isig.step_geometry(grid.ray_res, grid.ray_offset, st.ray_to_im.source_dist, S)
bfi = jnp.min(tr.first_inside)
wepl_min = jnp.min(tr.cumul_sp, axis=(1,2))
from raytracedicom_tpu.physics.interp import interp_at_index, interp_decimal_index
eidx = interp_decimal_index(tabs.energies, jnp.asarray(beam.energies))
scalef = interp_at_index(tabs.scale_facts, eidx)
peaks = interp_at_index(tabs.peak_depths, eidx)
a,b = isig.sigma_sq_air_coefs(peaks, True)
entry_z = bfi.astype(jnp.float32)*jnp.float32(grid.ray_res[2]) + jnp.float32(grid.ray_offset[2])
es = jnp.sqrt((a*entry_z*entry_z+b*entry_z)[:,None] + jnp.asarray(beam.spot_sigmas)**2)
after = jnp.minimum(first_larger_ordered(wepl_min, 1.05*peaks), jnp.minimum(first_larger_ordered(wepl_min, 1.05*peaks.max()), jnp.max(tr.first_outside))).astype(jnp.int32)

rw = T.time("K3 conv", lambda w: spot_conv.spot_to_ray_weights(w, es, grid.ray_dims, st.spot_delta, st.spot_offset, (grid.ray_res[0],grid.ray_res[1]), (grid.ray_offset[0],grid.ray_offset[1]), jnp.asarray([1.0,1.0]), 3.0), jnp.asarray(beam.spot_weights))
print("conv done", flush=True)

layer0 = isig.LayerScalars(eidx[-1], scalef[-1], peaks[-1], after[-1],
    2.0*a[-1]*geom.delta_z*geom.corner_z + b[-1]*geom.delta_z, a[-1]*geom.delta_z*geom.delta_z, es[-1,0]**2)

def fill_one(d, c):
    return isig.fill_idd_and_sigma(d, c, rw[-1], tr.first_inside, tr.first_outside, bfi, layer0, geom, tabs.cidd, tabs.rrl, tabs.rrl_scale)
fill = T.time("K2 fill (1 layer)", fill_one, tr.density, tr.cumul_sp)
print("fill done", flush=True)

z0 = jnp.clip(bfi, 0, S-W).astype(jnp.int32)
def sup_one(f):
    idd_w = jax.lax.dynamic_slice(f.idd, (z0,0,0), (W,nry,nrx))
    rs_w = jax.lax.dynamic_slice(f.r_sigma_eff, (z0,0,0), (W,nry,nrx))
    return superposition.superpose_bucketed(idd_w, rs_w, st.radii, st.pad, cfg.superp_chunk_z, 3.0)
bev = T.time("K5 superp (1 layer)", sup_one, fill)
print("superp done", flush=True)

from raytracedicom_tpu.geometry.transforms import invert_and_shift_fan_from_idx
d2f = invert_and_shift_fan_from_idx(jax.tree_util.tree_map(jnp.asarray, st.ray_to_dose),
    jnp.stack([jnp.float32(st.pad), jnp.float32(st.pad), -z0.astype(jnp.float32)]))
def transf(bv):
    dose = jnp.zeros(ct.shape, jnp.float32)
    return transfer.transfer_bev_to_dose(dose, bv, d2f, st.bbox_min, st.bbox_max)
T.time("K6 transfer", transf, bev)
print(T.report())
