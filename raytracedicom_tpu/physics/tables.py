"""Beam/tissue physics tables (the reference's EnergyStruct).

Loads the LUT text formats consumed by the reference
(energy_reader.cpp:12-165, energy_struct.h:13-38):

  * ``proton_cumul_ddd_data.txt``: header ``nEnergySamples nEnergies`` then
    energiesPerU[nE], peakDepths[nE], scaleFacts[nE], and the cumulative
    integral-depth-dose matrix (nE rows x nSamples cols, row-major).
  * ``density_Schneider2000_adj.txt`` / ``HU_to_SP_H&N_adj.txt`` /
    ``radiation_length[_inc_water].txt``: header ``nSamples scaleFact`` then
    nSamples values (indexed by HU+1000 resp. density, times scaleFact).
  * ``nuclear_weights_and_sigmas_{Soukup,Fluka,fit}.txt``: same header as the
    ddd file, repeated energy/peak/scale vectors (validated for consistency),
    then the nuclear weight and squared-sigma matrices.

Tables are plain float32 numpy arrays grouped in a NamedTuple pytree, so the
whole struct can be passed into jitted functions; device placement and
replication are handled by the engine/sharding layer.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

NUCLEAR_FILES = {
    "soukup": "nuclear_weights_and_sigmas_Soukup.txt",
    "fluka": "nuclear_weights_and_sigmas_Fluka.txt",
    "gauss_fit": "nuclear_weights_and_sigmas_fit.txt",
}

DEFAULT_LUT_DIRS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "data", "LUTs"),
    "/root/reference/LUTs",
)

DEFAULT_NPZ = os.path.join(os.path.dirname(__file__), "..", "..", "data", "physics_tables.npz")


class NuclearTables(NamedTuple):
    weight: np.ndarray    # (nEnergies, nEnergySamples) halo weight fraction
    sq_sigma: np.ndarray  # (nEnergies, nEnergySamples) halo sigma^2 [mm^2]


class PhysicsTables(NamedTuple):
    energies: np.ndarray     # (nEnergies,) MeV/u
    peak_depths: np.ndarray  # (nEnergies,) Bragg-peak depth [mm WEPL]
    scale_facts: np.ndarray  # (nEnergies,) WEPL -> ddd-sample-index scale
    cidd: np.ndarray         # (nEnergies, nEnergySamples) cumulative IDD
    density: np.ndarray      # (nDensitySamples,) density vs (HU+1000)*density_scale
    density_scale: np.ndarray  # scalar
    sp: np.ndarray           # (nSpSamples,) rel. stopping power vs (HU+1000)*sp_scale
    sp_scale: np.ndarray     # scalar
    rrl: np.ndarray          # (nRRlSamples,) 1/X0 vs density*rrl_scale
    rrl_scale: np.ndarray    # scalar
    nuclear: Optional[NuclearTables]  # None when nuclear correction disabled

    @property
    def n_energies(self) -> int:
        return int(self.cidd.shape[0])

    @property
    def n_energy_samples(self) -> int:
        return int(self.cidd.shape[1])


def _read_tokens(path: str) -> np.ndarray:
    with open(path) as f:
        return np.array(f.read().split(), dtype=np.float64)


def _load_scaled_vector(path: str):
    tok = _read_tokens(path)
    n = int(tok[0])
    scale = np.float32(tok[1])
    vec = tok[2 : 2 + n].astype(np.float32)
    if vec.size != n:
        raise ValueError(f"{path}: expected {n} samples, got {vec.size}")
    return vec, scale


def resolve_lut_dir(lut_dir: Optional[str] = None) -> str:
    if lut_dir is not None:
        return lut_dir
    for cand in DEFAULT_LUT_DIRS:
        if os.path.isfile(os.path.join(cand, "proton_cumul_ddd_data.txt")):
            return cand
    raise FileNotFoundError(
        "No LUT directory found; pass lut_dir or place tables under data/LUTs"
    )


def load_physics_tables(
    lut_dir: Optional[str] = None,
    *,
    water_cube: bool = False,
    nuclear: Optional[str] = None,
) -> PhysicsTables:
    """Load all physics tables.

    ``water_cube`` selects the water-adjusted radiation-length table, matching
    the reference's WATER_CUBE_TEST branch (energy_reader.cpp:77-95).
    ``nuclear`` is None or one of 'soukup' | 'fluka' | 'gauss_fit'.

    Prefers the repo's consolidated binary archive (data/physics_tables.npz,
    built by tools/import_luts.py) and falls back to parsing a text LUT
    directory in the reference's format.
    """
    if lut_dir is None and os.path.isfile(DEFAULT_NPZ):
        return tables_from_npz(DEFAULT_NPZ, water_cube=water_cube, nuclear=nuclear)
    lut_dir = resolve_lut_dir(lut_dir)

    tok = _read_tokens(os.path.join(lut_dir, "proton_cumul_ddd_data.txt"))
    n_samples, n_energies = int(tok[0]), int(tok[1])
    off = 2
    energies = tok[off : off + n_energies].astype(np.float32); off += n_energies
    peaks = tok[off : off + n_energies].astype(np.float32); off += n_energies
    scales = tok[off : off + n_energies].astype(np.float32); off += n_energies
    cidd = tok[off : off + n_samples * n_energies].astype(np.float32)
    if cidd.size != n_samples * n_energies:
        raise ValueError("proton_cumul_ddd_data.txt truncated")
    cidd = cidd.reshape(n_energies, n_samples)

    density, density_scale = _load_scaled_vector(
        os.path.join(lut_dir, "density_Schneider2000_adj.txt")
    )
    sp, sp_scale = _load_scaled_vector(os.path.join(lut_dir, "HU_to_SP_H&N_adj.txt"))
    rrl_name = "radiation_length_inc_water.txt" if water_cube else "radiation_length.txt"
    rrl, rrl_scale = _load_scaled_vector(os.path.join(lut_dir, rrl_name))

    nuc = None
    if nuclear is not None:
        key = nuclear.lower()
        if key not in NUCLEAR_FILES:
            raise ValueError(f"Unknown nuclear mode {nuclear!r}")
        ntok = _read_tokens(os.path.join(lut_dir, NUCLEAR_FILES[key]))
        ns, ne = int(ntok[0]), int(ntok[1])
        if (ns, ne) != (n_samples, n_energies):
            raise ValueError(
                f"{NUCLEAR_FILES[key]}: sample/energy count mismatch vs ddd data"
            )
        noff = 2
        for ref_vec, name in ((energies, "energies"), (peaks, "peak depths"),
                              (scales, "scale factors")):
            vec = ntok[noff : noff + ne].astype(np.float32); noff += ne
            if np.any(np.abs(vec - ref_vec) > 0.01):
                raise ValueError(f"{NUCLEAR_FILES[key]}: {name} differ from ddd data")
        w = ntok[noff : noff + ns * ne].astype(np.float32); noff += ns * ne
        s = ntok[noff : noff + ns * ne].astype(np.float32); noff += ns * ne
        if s.size != ns * ne:
            raise ValueError(f"{NUCLEAR_FILES[key]} truncated")
        nuc = NuclearTables(w.reshape(ne, ns), s.reshape(ne, ns))

    return PhysicsTables(
        energies=energies,
        peak_depths=peaks,
        scale_facts=scales,
        cidd=cidd,
        density=density,
        density_scale=np.float32(density_scale),
        sp=sp,
        sp_scale=np.float32(sp_scale),
        rrl=rrl,
        rrl_scale=np.float32(rrl_scale),
        nuclear=nuc,
    )


def save_npz(path: str, lut_dir: Optional[str] = None) -> None:
    """Consolidate every LUT variant from a text directory into one .npz."""
    lut_dir = resolve_lut_dir(lut_dir)
    base = load_physics_tables(lut_dir)
    water = load_physics_tables(lut_dir, water_cube=True)
    arrays = {
        "energies": base.energies,
        "peak_depths": base.peak_depths,
        "scale_facts": base.scale_facts,
        "cidd": base.cidd,
        "density": base.density,
        "density_scale": base.density_scale,
        "sp": base.sp,
        "sp_scale": base.sp_scale,
        "rrl": base.rrl,
        "rrl_scale": base.rrl_scale,
        "rrl_water": water.rrl,
        "rrl_water_scale": water.rrl_scale,
    }
    for key in NUCLEAR_FILES:
        t = load_physics_tables(lut_dir, nuclear=key)
        arrays[f"nuc_weight_{key}"] = t.nuclear.weight
        arrays[f"nuc_sq_sigma_{key}"] = t.nuclear.sq_sigma
    np.savez_compressed(path, **arrays)


def tables_from_npz(
    path: str = DEFAULT_NPZ,
    *,
    water_cube: bool = False,
    nuclear: Optional[str] = None,
) -> PhysicsTables:
    with np.load(path) as z:
        nuc = None
        if nuclear is not None:
            key = nuclear.lower()
            if f"nuc_weight_{key}" not in z:
                raise ValueError(f"Unknown nuclear mode {nuclear!r}")
            nuc = NuclearTables(z[f"nuc_weight_{key}"], z[f"nuc_sq_sigma_{key}"])
        rrl_key = "rrl_water" if water_cube else "rrl"
        return PhysicsTables(
            energies=z["energies"],
            peak_depths=z["peak_depths"],
            scale_facts=z["scale_facts"],
            cidd=z["cidd"],
            density=z["density"],
            density_scale=np.float32(z["density_scale"]),
            sp=z["sp"],
            sp_scale=np.float32(z["sp_scale"]),
            rrl=z[rrl_key],
            rrl_scale=np.float32(z[f"{rrl_key}_scale"]),
            nuclear=nuc,
        )
