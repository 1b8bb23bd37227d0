"""Pallas TPU kernels for the K5 Gaussian kernel superposition.

Reference: kernelSuperposition<rad> (kernel_wrapper.cuh:432-489) — each BEV
ray scatters its step dose into a (2r+1)^2 neighbourhood with separable
erf-difference weights; tileRadCalc (kernel_wrapper.cuh:256-313) classifies
every 32x8 tile by the radius its widest ray needs and the host batches the
tile lists per radius class (kernel_wrapper.cu:959-1056) so each tile runs a
kernel compiled for exactly its radius.

TPU-native restructure of the same idea:

* **Semantic truncation** is per (depth slice, 8-row band, 32-lane group):
  ``sem_radii`` reduces the reciprocal sigma over each 32x8 tile (the
  reference's full tile granularity, kernel_wrapper.cuh:27-28) and
  ``class_round`` rounds the radius up to a small static class set. The tile
  radii — not any execution detail — define which weight taps are kept, so
  the jnp mirror, the forward kernel, the backward kernel and the sharded
  overlap-add all truncate identically.
* **Execution** batches (slice, 32-row tile) tasks by radius class, like the
  reference's bucket lists: the host-side XLA prologue sorts the tasks of
  each depth chunk by class (``_exec_buckets``) and the kernel walks each
  class's contiguous range with a ``fori_loop`` whose body is compiled for
  that static radius — no per-offset predication, one branch per class per
  chunk instead of one per (offset, offset) pair.
* The separable scatter itself runs on **padded-width values with lane
  rolls**: inputs are pre-padded to a 128-multiple width that gives every
  roll >= radius of zero margin, so ``x``-shifts are wraparound-safe vector
  rotates and the ``y``-shifted flushes are dynamic-sublane accumulates into
  the VMEM-resident output slab. Weights are erf differences computed with
  one erf evaluation per tap (consecutive taps share the boundary erf).

Weights w[k] = 0.5*(erf(rs*(k+0.5)) - erf(rs*(k-0.5)))
(kernel_wrapper.cuh:459-467); w[0] = erf(rs/2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

SEM_TY = 8              # truncation band height (reference tile y, kernel_wrapper.cuh:28)
SEM_TX = 32             # truncation group width (reference tile x, kernel_wrapper.cuh:27)
_DEAD_RS = 1e8          # reciprocal sigmas above this mark dead rays
_INV_SQRT_PI = 0.5641895835477563


def _erf_pos(x):
    """erf for x >= 0 via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7, the
    same accuracy class as CUDA's erff) — Mosaic has no native erf lowering.
    Returns (erf(x), exp(-x*x)); the exponential is reused by the weight
    derivatives in the backward kernel."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    ex = jnp.exp(-x * x)
    return 1.0 - poly * ex, ex


def radius_classes(max_radius: int):
    """Static radius classes compiled into the kernel. Radii round UP to the
    next class (never truncating below the requested radius), mirroring the
    reference's batching of sparse radius classes into the next-larger
    kernel (kernel_wrapper.cu:968-976)."""
    base = (0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32)
    return tuple(sorted({c for c in base if c < max_radius} | {max_radius}))


def sem_tile_rows(ny: int) -> int:
    return SEM_TY if ny % SEM_TY == 0 else ny


def sem_tile_cols(nx: int) -> int:
    return SEM_TX if nx % SEM_TX == 0 else nx


def exec_tile_rows(ny: int) -> int:
    for t in (32, 16, 8):
        if ny % t == 0:
            return t
    return ny


def sem_radii(rs: Array, ks_sigma_cutoff: float, max_radius: int) -> Array:
    """Per-(slice, 8-row band, 32-lane group) superposition radius from the
    tile's minimum reciprocal sigma — the reference's tile formula
    rad = KS_CUTOFF/(sqrt(2)*minR)+0.5 (kernel_wrapper.cuh:303) at its full
    32x8 tile granularity; -1 marks an all-dead tile. Returns
    (S, Y//8, X//32)."""
    S, Y, X = rs.shape
    st = sem_tile_rows(Y)
    sx = sem_tile_cols(X)
    min_rs = jnp.min(rs.reshape(S, Y // st, st, X // sx, sx), axis=(2, 4))
    rad = (ks_sigma_cutoff / (jnp.sqrt(jnp.asarray(2.0, rs.dtype)) * min_rs)
           + 0.5).astype(jnp.int32)
    rad = jnp.minimum(rad, max_radius)
    return jnp.where(min_rs > _DEAD_RS, -1, rad)


def class_round(rads: Array, classes) -> Array:
    """Round radii UP to the next value in ``classes`` (-1 passes through)."""
    cs = jnp.asarray(classes, jnp.int32)
    idx = jnp.minimum(jnp.searchsorted(cs, rads), len(classes) - 1)
    return jnp.where(rads < 0, -1, cs[idx]).astype(jnp.int32)


def effective_sem_radii(rs: Array, ks_sigma_cutoff: float,
                        max_radius: int) -> Array:
    """The (slice, band, lane-group) truncation radii the op applies."""
    return class_round(sem_radii(rs, ks_sigma_cutoff, max_radius),
                       radius_classes(max_radius))


def step_radii(rs: Array, ks_sigma_cutoff: float, max_radius: int) -> Array:
    """Per-depth-slice radius (the max over the slice's tiles; -1 = dead)."""
    return jnp.max(sem_radii(rs, ks_sigma_cutoff, max_radius), axis=(1, 2))


def _widths(nx: int, pad: int, radius: int):
    """Internal lane width: every roll by <= radius must stay inside zero
    margin on both sides of the out-padded window."""
    wi = -(-(nx + 2 * pad + 2 * radius) // 128) * 128
    px = (wi - nx) // 2
    return wi, px


def _pick_chunk(n_bufs: int, ny: int, wi: int, pad: int,
                vmem_budget: int = 4 * 2 ** 20) -> int:
    """Depth slices per grid step: amortizes the per-step fixed cost
    (measured ~4.7 us/step on v5e) under a VMEM cap for the double-buffered
    blocks (n_bufs (cz,ny,wi) slabs + the (cz,ny+2pad,wi) padded ones);
    the kernel's own value stack (weight slabs, tile accumulators) needs
    the remaining headroom."""
    per_cz = (n_bufs * ny * wi + (ny + 2 * pad) * wi) * 4 * 2
    return max(1, min(2, vmem_budget // per_cz))


def _exec_buckets(eff_sem: Array, classes, cz: int, n_exec: int, gpe: int):
    """Sort each chunk's (slice, exec-tile) tasks by radius class (the tap
    masks inside the tile body stay lane-group granular; the class only
    bounds the offset loop, like the reference's next-larger-class batching).

    Returns (order (n_chunks, cz*n_exec) task ids sorted dead-first then by
    class, off (n_chunks, n_classes+1) class start offsets)."""
    S8, n8, nxg = eff_sem.shape
    exec_rad = jnp.max(eff_sem.reshape(S8, n_exec, gpe * nxg), axis=2)
    cs = jnp.asarray(classes, jnp.int32)
    cls = jnp.searchsorted(cs, exec_rad).astype(jnp.int32)
    cls = jnp.where(exec_rad < 0, -1, cls)
    n_chunks = S8 // cz
    clsr = cls.reshape(n_chunks, cz * n_exec)
    order = jnp.argsort(clsr, axis=1, stable=True).astype(jnp.int32)
    sorted_cls = jnp.take_along_axis(clsr, order, axis=1)
    targets = jnp.arange(len(classes) + 1, dtype=jnp.int32)
    off = jax.vmap(lambda row: jnp.searchsorted(row, targets))(sorted_cls)
    return order, off.astype(jnp.int32)


def _pad_operands(idd, rs, rad_sem, cz, px, wi):
    """Pad depth to a chunk multiple and lanes to the internal width."""
    S, Y, X = idd.shape
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    idd = jnp.pad(idd, ((0, s_pad - S), (0, 0), (px, wi - px - X)))
    rs = jnp.pad(rs, ((0, s_pad - S), (0, 0), (px, wi - px - X)),
                 constant_values=10.0 * _DEAD_RS)
    rad_sem = jnp.pad(rad_sem, ((0, s_pad - S), (0, 0), (0, 0)),
                      constant_values=-1)
    return idd, rs, rad_sem, n_chunks, s_pad


def _masked_weights(rs, rge, q, with_derivs=False):
    """Erf-difference weight taps 0..q masked per 8-row band (one erf per
    tap boundary; taps beyond a band's radius are zero so truncation is
    identical to the jnp mirror)."""
    w, dw = [], []
    e_prev = ex_prev = None
    for k in range(q + 1):
        if k == 0:
            e_prev, ex_prev = _erf_pos(0.5 * rs)
            wk = e_prev
            dk = _INV_SQRT_PI * ex_prev if with_derivs else None
        else:
            e_k, ex_k = _erf_pos(rs * (k + 0.5))
            wk = 0.5 * (e_k - e_prev)
            if with_derivs:
                dk = _INV_SQRT_PI * ((k + 0.5) * ex_k - (k - 0.5) * ex_prev)
            e_prev, ex_prev = e_k, ex_k
        keep = rge >= k
        w.append(jnp.where(keep, wk, 0.0))
        if with_derivs:
            dw.append(jnp.where(keep, dk, 0.0))
    return (w, dw) if with_derivs else w


def _tile_eff_map(eff_ref, step, s_loc, t_idx, ty, st, n8, gpe, nxg, px, sx,
                  wi):
    """(ty, wi) per-(row, lane) truncation radius built from the exec tile's
    (band, lane-group) scalars. Lanes outside the data window clip to the
    edge groups; that clipped radius is harmless because padded lanes carry
    zero idd (forward) and ~0 cotangent (backward), not because their
    weights vanish (for huge padded rs the k=0 erf-difference tap is ~1)."""
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (ty, wi), 0) // st
    lane = jax.lax.broadcasted_iota(jnp.int32, (ty, wi), 1)
    xg = jnp.clip((lane - px) // sx, 0, nxg - 1)
    rge = jnp.zeros((ty, wi), jnp.int32)
    for gi in range(gpe):
        for xi in range(nxg):
            e = eff_ref[step, (s_loc * n8 + t_idx * gpe + gi) * nxg + xi]
            rge = jnp.where((rows8 == gi) & (xg == xi), e, rge)
    return rge


def _fwd_kernel(order_ref, off_ref, eff_ref, d_ref, rs_ref, out_ref, *,
                classes, pad, ny, wi, cz, ty, n_exec, n8, st, gpe, nxg, px,
                sx):
    out_ref[:] = jnp.zeros((cz, ny + 2 * pad, wi), d_ref.dtype)
    step = pl.program_id(0)

    for ci, q in enumerate(classes):
        # Mosaic needs provably 8-aligned dynamic sublane windows, so the
        # tile accumulates its whole (ty + 2*qa)-row footprint in a value at
        # STATIC offsets and flushes with ONE dynamic RMW whose start
        # pad + y0 - qa is a multiple of 8 (y0 and ty are; qa >= q absorbs
        # pad's misalignment).
        qa = q + (pad - q) % 8

        def tile_body(k, carry, q=q, qa=qa):
            task = order_ref[step, k]
            s_loc = task // n_exec
            t_idx = task - s_loc * n_exec
            y0 = pl.multiple_of(t_idx * ty, 8)
            d = d_ref[s_loc, pl.ds(y0, ty), :]
            rs = rs_ref[s_loc, pl.ds(y0, ty), :]
            rge = _tile_eff_map(eff_ref, step, s_loc, t_idx, ty, st, n8, gpe,
                                nxg, px, sx, wi)
            w = _masked_weights(rs, rge, q)
            tile_out = jnp.zeros((ty + 2 * qa, wi), d.dtype)
            for ky in range(q + 1):
                base = d * w[ky]
                acc = base * w[0]
                for dx in range(1, q + 1):
                    m = base * w[dx]
                    # pltpu.roll wants non-negative shifts; wi - dx == -dx
                    # modulo the lane width (zero margins make wrap safe)
                    acc = acc + pltpu.roll(m, dx, 1) + pltpu.roll(m, wi - dx, 1)
                # jnp.pad instead of .at[].add: a full-axis scatter-add
                # captures an empty index constant pallas_call rejects
                tile_out = tile_out + jnp.pad(acc, ((qa + ky, qa - ky), (0, 0)))
                if ky > 0:
                    tile_out = tile_out + jnp.pad(acc, ((qa - ky, qa + ky),
                                                        (0, 0)))
            row0 = pl.multiple_of(pad + y0 - qa, 8)
            out_ref[s_loc, pl.ds(row0, ty + 2 * qa), :] += tile_out
            return carry

        jax.lax.fori_loop(off_ref[step, ci], off_ref[step, ci + 1],
                          tile_body, 0)


def superpose_pallas_raw(idd: Array, rs: Array, rad_sem: Array,
                         radius: int, pad: int) -> Array:
    """(S, Y, X) -> (S, Y+2*pad, X+2*pad). ``rad_sem`` (S, Y//8, X//32)
    carries the class-rounded per-tile truncation radii (see
    ``effective_sem_radii``)."""
    if pad < radius:
        raise ValueError("pad must cover radius")
    S, Y, X = idd.shape
    classes = radius_classes(radius)
    wi, px = _widths(X, pad, radius)
    ty = exec_tile_rows(Y)
    st = sem_tile_rows(Y)
    sx = sem_tile_cols(X)
    n8, n_exec, gpe, nxg = Y // st, Y // ty, ty // st, X // sx
    cz = _pick_chunk(2, Y, wi, pad)
    idd_p, rs_p, rad_p, n_chunks, s_pad = _pad_operands(
        idd, rs, rad_sem, cz, px, wi)
    order, off = _exec_buckets(rad_p.reshape(s_pad, n8, nxg), classes, cz,
                               n_exec, gpe)
    eff_p = rad_p.reshape(n_chunks, cz * n8 * nxg)

    kern = functools.partial(_fwd_kernel, classes=classes, pad=pad, ny=Y,
                             wi=wi, cz=cz, ty=ty, n_exec=n_exec, n8=n8,
                             st=st, gpe=gpe, nxg=nxg, px=px, sx=sx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((cz, Y, wi), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((cz, Y, wi), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((cz, Y + 2 * pad, wi), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s_pad, Y + 2 * pad, wi), idd.dtype),
        grid_spec=grid_spec,
    )(order, off, eff_p, idd_p, rs_p)
    return out[:S, :, px - pad: px + pad + X]


def superpose_masked_jnp(idd: Array, rs: Array, rad_sem: Array,
                         radius: int, pad: int) -> Array:
    """jnp mirror of the kernel: full-radius offset loop with weights zeroed
    beyond each (slice, band, lane-group) radius — the differentiation rule
    and the CPU fallback (identical truncation)."""
    from .superposition import erf_diff_weights
    S, Y, X = idd.shape
    st = sem_tile_rows(Y)
    sx = sem_tile_cols(X)
    w = erf_diff_weights(rs, radius)                 # (r+1, S, Y, X)
    rad_pix = jnp.repeat(jnp.repeat(rad_sem, st, axis=1), sx, axis=2)
    ks = jnp.arange(radius + 1)[:, None, None, None]
    w = jnp.where(ks <= rad_pix[None], w, 0.0)
    out = jnp.zeros((S, Y + 2 * pad, X + 2 * pad), idd.dtype)
    for dy in range(-radius, radius + 1):
        contrib_y = idd * w[abs(dy)]
        for dx in range(-radius, radius + 1):
            out = out.at[:, pad + dy: pad + dy + Y, pad + dx: pad + dx + X].add(
                contrib_y * w[abs(dx)]
            )
    return out


def _bwd_kernel(order_ref, off_ref, eff_ref, d_ref, rs_ref, g_ref,
                gd_ref, grs_ref, *, classes, pad, ny, nx, wi, px, cz, ty,
                n_exec, n8, st, gpe, nxg, sx):
    """Adjoint w.r.t. (idd, rs). Weights live at the SOURCE index, so per
    source tile:

      g_d  = sum_{j,k} w[j] w[k] Q_jk,   Q_jk = sum of G windows at (+-j,+-k)
      g_rs = d * sum_{j,k} (dw[j] w[k] + w[j] dw[k]) Q_jk

    computed as R_j = sum_k w[k] Q_jk and R'_j = sum_k dw[k] Q_jk."""
    gd_ref[:] = jnp.zeros((cz, ny, nx), d_ref.dtype)
    grs_ref[:] = jnp.zeros((cz, ny, nx), d_ref.dtype)
    step = pl.program_id(0)

    for ci, q in enumerate(classes):
        qa = q + (pad - q) % 8

        def tile_body(k, carry, q=q, qa=qa):
            task = order_ref[step, k]
            s_loc = task // n_exec
            t_idx = task - s_loc * n_exec
            y0 = pl.multiple_of(t_idx * ty, 8)
            d = d_ref[s_loc, pl.ds(y0, ty), :]
            rs = rs_ref[s_loc, pl.ds(y0, ty), :]
            rge = _tile_eff_map(eff_ref, step, s_loc, t_idx, ty, st, n8, gpe,
                                nxg, px, sx, wi)
            w, dw = _masked_weights(rs, rge, q, with_derivs=True)
            # one aligned dynamic read of the tile's G footprint; per-j
            # windows are then static slices of the value
            row0 = pl.multiple_of(pad + y0 - qa, 8)
            gwin = g_ref[s_loc, pl.ds(row0, ty + 2 * qa), :]
            gd_acc = jnp.zeros((ty, wi), d.dtype)
            grs_acc = jnp.zeros((ty, wi), d.dtype)
            for j in range(q + 1):
                gj = gwin[qa + j: qa + j + ty]
                if j > 0:
                    gj = gj + gwin[qa - j: qa - j + ty]
                rj = w[0] * gj
                rpj = dw[0] * gj
                for kk in range(1, q + 1):
                    qk = pltpu.roll(gj, kk, 1) + pltpu.roll(gj, wi - kk, 1)
                    rj = rj + w[kk] * qk
                    rpj = rpj + dw[kk] * qk
                gd_acc = gd_acc + w[j] * rj
                grs_acc = grs_acc + dw[j] * rj + w[j] * rpj
            grs_acc = grs_acc * d
            gd_ref[s_loc, pl.ds(y0, ty), :] = gd_acc[:, px: px + nx]
            grs_ref[s_loc, pl.ds(y0, ty), :] = grs_acc[:, px: px + nx]
            return carry

        jax.lax.fori_loop(off_ref[step, ci], off_ref[step, ci + 1],
                          tile_body, 0)


def superpose_bwd_pallas(idd: Array, rs: Array, g: Array, rad_sem: Array,
                         radius: int, pad: int):
    """Pallas adjoint: (g_idd, g_rs) from the padded cotangent ``g``
    (S, Y+2*pad, X+2*pad), truncated by the same ``rad_sem`` as the forward."""
    S, Y, X = idd.shape
    classes = radius_classes(radius)
    wi, px = _widths(X, pad, radius)
    ty = exec_tile_rows(Y)
    st = sem_tile_rows(Y)
    sx = sem_tile_cols(X)
    n8, n_exec, gpe, nxg = Y // st, Y // ty, ty // st, X // sx
    cz = _pick_chunk(4, Y, wi, pad)
    idd_p, rs_p, rad_p, n_chunks, s_pad = _pad_operands(
        idd, rs, rad_sem, cz, px, wi)
    g_p = jnp.pad(g, ((0, s_pad - S), (0, 0), (px - pad, wi - px - pad - X)))
    order, off = _exec_buckets(rad_p.reshape(s_pad, n8, nxg), classes, cz,
                               n_exec, gpe)
    eff_p = rad_p.reshape(n_chunks, cz * n8 * nxg)

    kern = functools.partial(_bwd_kernel, classes=classes, pad=pad, ny=Y,
                             nx=X, wi=wi, px=px, cz=cz, ty=ty, n_exec=n_exec,
                             n8=n8, st=st, gpe=gpe, nxg=nxg, sx=sx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((cz, Y, wi), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((cz, Y, wi), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((cz, Y + 2 * pad, wi), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((cz, Y, X), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((cz, Y, X), lambda i, *_: (i, 0, 0)),
        ),
    )
    gd, grs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, Y, X), idd.dtype),
            jax.ShapeDtypeStruct((s_pad, Y, X), idd.dtype),
        ),
        grid_spec=grid_spec,
    )(order, off, eff_p, idd_p, rs_p, g_p)
    return gd[:S], grs[:S]


# ---------------------------------------------------------------------------
# Differentiable wrappers. ``rad_sem`` is part of the op's semantics (the
# truncation), so it is saved as a residual verbatim — truncation no longer
# depends on any execution detail (chunking, tiling), and forward/backward
# masks match by construction.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def superpose_pallas(idd: Array, rs: Array, rad_sem: Array,
                     radius: int, pad: int) -> Array:
    return superpose_pallas_raw(idd, rs, rad_sem, radius, pad)


def _sup_fwd(idd, rs, rad_sem, radius, pad):
    out = superpose_pallas_raw(idd, rs, rad_sem, radius, pad)
    return out, (idd, rs, rad_sem)


def _sup_bwd(radius, pad, res, g):
    """Adjoint dispatch mirrors the forward's adaptivity: an MXU banded-
    matmul transpose when every slice's live rays share one sigma (runtime
    lax.cond — homogeneous media, incl. the watercube benchmark), the
    per-source Pallas/jnp adjoint otherwise."""
    from .pallas_lut import on_tpu
    from .superposition import slice_uniform_rs, superpose_bwd_uniform_mxu

    idd, rs, rad_sem = res
    rs_slice, all_uniform = slice_uniform_rs(idd, rs)
    rad_steps = jnp.max(rad_sem, axis=(1, 2))

    def mxu(args):
        a, b, gg = args
        return superpose_bwd_uniform_mxu(a, b, rs_slice, gg, rad_steps,
                                         radius, pad)

    def general(args):
        a, b, gg = args
        if on_tpu():
            return superpose_bwd_pallas(a, b, gg, rad_sem, radius, pad)
        _, vjp = jax.vjp(
            lambda u, v: superpose_masked_jnp(u, v, rad_sem, radius, pad), a, b
        )
        return vjp(gg)

    di, dr = jax.lax.cond(all_uniform, mxu, general, (idd, rs, g))
    return di, dr, None


superpose_pallas.defvjp(_sup_fwd, _sup_bwd)


# ---------------------------------------------------------------------------
# Adaptive dispatch: MXU banded matmuls when every slice's live rays share
# one sigma (homogeneous media — the watercube benchmark), per-source
# bucketed kernel otherwise. The lax.cond predicate is a runtime value, so
# one compiled program serves both; only the taken branch executes on TPU.
# On the uniform manifold per-tile radii equal the slice radius for every
# live tile (dead tiles carry zero dose), so the two branches agree exactly.
# ---------------------------------------------------------------------------

def _superpose_general(idd, rs, rad_sem, radius, pad):
    from .pallas_lut import on_tpu
    if on_tpu():
        return superpose_pallas_raw(idd, rs, rad_sem, radius, pad)
    return superpose_masked_jnp(idd, rs, rad_sem, radius, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def superpose_adaptive(idd: Array, rs: Array, rad_sem: Array,
                       radius: int, pad: int) -> Array:
    """(S, Y, X) -> padded slab; picks the MXU or per-source path per call."""
    from .superposition import slice_uniform_rs, superpose_uniform_mxu
    rs_slice, all_uniform = slice_uniform_rs(idd, rs)
    rad_steps = jnp.max(rad_sem, axis=(1, 2))
    return jax.lax.cond(
        all_uniform,
        lambda a: superpose_uniform_mxu(a[0], rs_slice, rad_steps, radius, pad),
        lambda a: _superpose_general(a[0], a[1], rad_sem, radius, pad),
        (idd, rs),
    )


def _sup_adaptive_fwd(idd, rs, rad_sem, radius, pad):
    out = superpose_adaptive(idd, rs, rad_sem, radius, pad)
    return out, (idd, rs, rad_sem)


superpose_adaptive.defvjp(_sup_adaptive_fwd, _sup_bwd)
