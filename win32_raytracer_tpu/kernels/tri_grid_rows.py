"""Pallas TPU grid-accelerated triangle kernel, lane-major in and out.

The triangle twin of kernels/hit_grid_rows.py: a scalar-prefetched
per-ray-block schedule (active Morton tiles, from tri_accel's
conservative block mask) drives a fori_loop that Möller-Trumbore-sweeps
ONLY the scheduled tiles, with the winner carried as (t, attribute rows)
and merged via the one-hot MXU gather whose extra ones-column returns the
per-lane "this tile won" flag.

At bunny scale (BASELINE config 4: >=10k triangles) the brute MXU sweep
(tri_pallas_mxu.py) does T/128 matmul tiles per ray block regardless of
geometry; here a block pays only for tiles its rays' t-segments can
reach, and a composite scene's sphere pass caps t so occluded tiles drop
out too.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_HIT_T
from ..ops.hit import F32_MAX
from ..ops.hit_tri import (
    TRI_ATTR_COLS, _T_E1X, _T_E2X, _T_MAT, _T_ALR, _T_ALB, _T_FUZZ,
    _T_IOR, _T_IDX,
)
from ..ops.rows import HitRecordRows
from ..tri_accel import (
    TRI_GRID_COLS, TriGridScene, _sweep_tile_rows, tri_block_schedule_rows,
)

DEFAULT_TRI_GRID_RAY_BLOCK = 2048
# SMEM holds the double-buffered [NB, 1+T] i32 schedule plus the
# [NB, T+1] i32 quantized tile entry bounds; cap a single pallas_call's
# block count so it stays under budget and split the batch into segments
# above that (the driver's batches are pipelined anyway).
_SMEM_BUDGET = 640 * 1024

# Tile entry bounds ride SMEM as i32: floor(min(tlo, _TLO_CAP) * _TLO_SCALE).
# Flooring (and capping) only LOWERS the stored bound, which can only
# delay an early exit — never skip a reachable tile.  _TLO_PAD sorts
# inactive tiles last and pads the schedule's one-past-the-end read.
_TLO_SCALE = np.float32(1024.0)
_TLO_INV = np.float32(1.0 / 1024.0)
_TLO_CAP = np.float32(1.0e6)
_TLO_PAD = np.float32(1.5e6)

# Tile AABBs for the in-kernel any-touch skip ride SMEM i32-quantized at
# the same scale, CONSERVATIVELY expanded (floor-1 on lo, ceil+1 on hi:
# a full quantization step of margin even where a coordinate quantizes
# exactly — e.g. an axis-planar floor tile at y == 0) so quantization
# can only pass extra tiles, never skip a touched one.
_BX_CLIP = np.float32(1.0e6)
_EPS_DIR = np.float32(1e-12)
# Slop on the slab-interval comparison: the winner t the progressive
# bound carries comes from the split-bf16 MXU contraction (~2^-17
# relative error) and the slab t itself rounds in f32 — a true hit
# exactly on a tile face must never be excluded by round-off.  Costs
# only near-tangent extra sweeps.
_SKIP_SLOP_REL = np.float32(1e-4)
_SKIP_SLOP_ABS = np.float32(1e-5)


def _load_box(bxq_ref, tid):
    """Dequantize tile ``tid``'s AABB from SMEM once (6 scalar reads —
    shared by every sub-group's slab test)."""
    return tuple(bxq_ref[tid, k].astype(jnp.float32) * _TLO_INV
                 for k in range(6))


def _any_touch(box, o3, inv3, t_lo0, t_hi0):
    """Scalar predicate: does ANY lane's capped segment [t_lo0, t_hi0]
    slab-intersect the (conservatively quantized) AABB ``box``
    (a ``_load_box`` 6-tuple)?

    The schedule mask (tri_accel.tri_block_schedule_rows) is doubly
    conservative — per-ray segment box -> block union box -> tile
    overlap — so union degeneracy (left-goers + right-goers schedule
    the middle) makes most visited tiles exactly-untouched (sim:
    bench/tri_knob_sim.py --anyskip, 1.77x static / 3.16x with the
    progressive t_ref bound at St=64 RB=2048).  ~25 VPU slots per lane
    per tile vs the 4*St*K-MAC contraction this gates (~2% overhead)."""
    t_lo, t_hi = t_lo0, t_hi0
    for ax in range(3):
        ta = (box[2 * ax] - o3[ax]) * inv3[ax]
        tb = (box[2 * ax + 1] - o3[ax]) * inv3[ax]
        t_lo = jnp.maximum(t_lo, jnp.minimum(ta, tb))
        t_hi = jnp.minimum(t_hi, jnp.maximum(ta, tb))
    return jnp.any(t_lo <= t_hi * (1 + _SKIP_SLOP_REL) + _SKIP_SLOP_ABS)


def _safe_inv(d):
    """1/d with +-eps substituted for near-zero components (the host
    mask's convention, tri_accel.clip_segment_to_box)."""
    dn = jnp.where(jnp.abs(d) < _EPS_DIR,
                   jnp.where(d < 0, -_EPS_DIR, _EPS_DIR), d)
    return 1.0 / dn


def _merge_tile(t, tl, t_ref, g_ref, st, cols=slice(None)):
    """Merge one tile's per-pair t matrix [St, Rc] (F32_MAX = invalid)
    into the carried (t_ref, g_ref) winner state, restricted to the
    static column slice ``cols`` (the sub-gate's lane sub-group; the
    default merges the whole block)."""
    tile_t = jnp.min(t, axis=0, keepdims=True)            # [1, Rc]
    better = tile_t < t_ref[:, cols]
    eq = t == tile_t
    sub = jax.lax.broadcasted_iota(
        jnp.int32, t.shape, 0).astype(jnp.float32)
    big = jnp.float32(st + 1)
    winner = jnp.min(jnp.where(eq, sub, big), axis=0, keepdims=True)
    onehot = ((sub == winner) & better).astype(jnp.float32)

    delta = jax.lax.dot_general(
        tl, onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [17, Rc]
    flag = delta[TRI_ATTR_COLS:TRI_ATTR_COLS + 1, :]
    g_ref[:, cols] = g_ref[:, cols] * (1.0 - flag) + delta
    t_ref[:, cols] = jnp.where(better, tile_t, t_ref[:, cols])


def _merge_tile_deferred(t, tid, t_ref, w_ref, st, cols=slice(None)):
    """Deferred-gather twin of ``_merge_tile``: carry only (best t,
    winner ROW INDEX tid*St+sub) — the 17 attribute rows are fetched
    after the sweep by one XLA gather (hit_triangles_grid_rows), so the
    per-tile one-hot contraction and the 17-row VMEM read-modify-write
    disappear.  Winner selection (strict < across tiles, min sub-row on
    in-tile ties) matches ``_merge_tile`` exactly."""
    tile_t = jnp.min(t, axis=0, keepdims=True)            # [1, Rc]
    better = tile_t < t_ref[:, cols]
    eq = t == tile_t
    sub = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    winner = jnp.min(jnp.where(eq, sub, jnp.int32(st)), axis=0,
                     keepdims=True)
    w_ref[:, cols] = jnp.where(better, tid * st + winner, w_ref[:, cols])
    t_ref[:, cols] = jnp.where(better, tile_t, t_ref[:, cols])


def _gated_sweep(do_tile_cols, any_skip, n_sub, bxq_ref, o3, inv3,
                 seg_lo, cap, t_ref):
    """Build ``sweep_tile(tid)``: the exact any-touch gate applied per
    RB/n_sub-lane sub-group, each passing sub-group paying only ITS
    columns' contraction+merge (``do_tile_cols(tid, col_slice)``).
    Lanes are chord-key sorted, so sub-groups are spatially coherent —
    a tile touched only by one corner of the block skips the other
    sub-groups' MACs (cfg.tri_sub_gate; n_sub=1 = whole-block gate)."""
    def sweep_tile(tid):
        if not any_skip:
            do_tile_cols(tid, slice(None))
            return
        box = _load_box(bxq_ref, tid)
        r = cap.shape[1]
        w = r // n_sub
        for s in range(n_sub):
            sl = slice(s * w, (s + 1) * w) if n_sub > 1 else slice(None)
            hi = jnp.minimum(cap[:, sl], t_ref[:, sl])
            pred = _any_touch(box,
                              tuple(x[:, sl] for x in o3),
                              tuple(x[:, sl] for x in inv3),
                              seg_lo[:, sl], hi)

            @pl.when(pred)
            def _(sl=sl):
                do_tile_cols(tid, sl)

    return sweep_tile


def _sweep_scheduled(sched_ref, tlo_ref, cap, sweep_tile, t_ref, g_ref,
                     early_exit):
    """Run ``sweep_tile(tid)`` over block i's scheduled tiles.

    With ``early_exit`` the schedule is sorted front-to-back by the tile
    entry bound tlo (tri_accel.tri_block_schedule_rows) and the loop
    STOPS once every lane's ``min(best_t, segment end)`` is nearer than
    the next tile's bound: any hit a remaining tile could produce would
    have t >= that bound, i.e. strictly worse.  Exact — identical winners
    to the full sweep."""
    i = pl.program_id(0)
    count = sched_ref[i, 0]
    if not early_exit:
        def body(j, carry):
            sweep_tile(sched_ref[i, 1 + j])
            return carry
        jax.lax.fori_loop(0, count, body, 0)
        return

    def body(carry):
        j, _ = carry
        sweep_tile(sched_ref[i, 1 + j])
        bound = jnp.max(jnp.minimum(t_ref[:, :], cap))
        tlo_next = tlo_ref[i, j + 1].astype(jnp.float32) * _TLO_INV
        stop = jnp.where(tlo_next > bound, 1, 0).astype(jnp.int32)
        return (j + 1, stop)

    def cond(carry):
        j, stop = carry
        return jnp.logical_and(j < count, stop == 0)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


def _tri_grid_kernel(sched_ref, tlo_ref, bxq_ref, rays_ref, attrs_ref,
                     t_ref, g_ref, *, st, min_t, early_exit, any_skip,
                     n_sub=1, deferred=False):
    """Exact-f32 VPU Möller-Trumbore per scheduled tile (the oracle-grade
    variant; ~50 VPU slots per pair).  sched [NB, 1+T] i32 (SMEM): col 0
    = active count, cols 1.. = active tile ids front-to-back; tlo
    [NB, T+1] i32 quantized entry bounds in schedule order; bxq [T, 8]
    i32 quantized tile AABBs (the any-touch skip); rays [7, R]
    (o rows 0-2, d rows 3-5, per-lane segment-end cap row 6); attrs
    [T*St, 17] VMEM-resident; outputs t [1, R], winner rows [17, R]."""
    t_ref[:, :] = jnp.full_like(t_ref[:, :], F32_MAX)
    g_ref[:, :] = (jnp.full_like(g_ref[:, :], -1) if deferred
                   else jnp.zeros_like(g_ref[:, :]))

    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    cap = rays_ref[6:7, :]
    o3 = (ox, oy, oz)
    inv3 = (_safe_inv(dx), _safe_inv(dy), _safe_inv(dz))
    seg_lo = jnp.full_like(cap, jnp.float32(min_t))

    def do_tile_cols(tid, sl):
        tl = attrs_ref[pl.ds(tid * st, st), :]            # [St, 17]
        t = _sweep_tile_rows(tl, ox[:, sl], oy[:, sl], oz[:, sl],
                             dx[:, sl], dy[:, sl], dz[:, sl], min_t)
        if deferred:
            _merge_tile_deferred(t, tid, t_ref, g_ref, st, cols=sl)
        else:
            _merge_tile(t, tl, t_ref, g_ref, st, cols=sl)

    sweep_tile = _gated_sweep(do_tile_cols, any_skip, n_sub, bxq_ref,
                              o3, inv3, seg_lo, cap, t_ref)
    _sweep_scheduled(sched_ref, tlo_ref, cap, sweep_tile, t_ref, g_ref,
                     early_exit)


def _tri_grid_kernel_mxu(sched_ref, tlo_ref, bxq_ref, rays_ref, attrs_ref,
                         coef_ref, t_ref, g_ref, *, st, min_t, n_terms,
                         early_exit, any_skip, n_sub=1, deferred=False):
    """Production variant: each scheduled tile's four MT quantities
    (det/u_num/v_num/t_num) come from ONE [4*St, K] x [K, R] split-bf16
    MXU contraction against the shared 16-feature ray stack
    (tri_pallas_mxu's factoring), leaving ~14 VPU slots per pair.
    Accuracy: the limb products carry ~2^-17 relative error — grazing
    hits and near-exact t ties can flip vs the exact VPU variant
    (tri_pallas_mxu's documented stance)."""
    from .hit_pallas_v6 import _PAIRS, _split_limbs
    from .tri_pallas_mxu import _DET_EPS

    t_ref[:, :] = jnp.full_like(t_ref[:, :], F32_MAX)
    g_ref[:, :] = (jnp.full_like(g_ref[:, :], -1) if deferred
                   else jnp.zeros_like(g_ref[:, :]))

    o = rays_ref[0:3, :]
    d = rays_ref[3:6, :]
    cap = rays_ref[6:7, :]
    pairs = _PAIRS[n_terms]
    ones = jnp.ones_like(o[0:1])
    outer = jnp.concatenate([o[k:k + 1] * d for k in range(3)], axis=0)
    feats = jnp.concatenate([o, d, outer, ones], axis=0)   # [16, R] f32
    n_limbs = 1 + max(j for _, j in pairs)
    f_limbs = [l.astype(jnp.float32) for l in _split_limbs(feats, n_limbs)]
    f_stack = jnp.concatenate(
        [f_limbs[j] for _, j in pairs], axis=0).astype(jnp.bfloat16)
    o3 = (o[0:1], o[1:2], o[2:3])
    inv3 = (_safe_inv(d[0:1]), _safe_inv(d[1:2]), _safe_inv(d[2:3]))
    seg_lo = jnp.full_like(cap, jnp.float32(min_t))

    def do_tile_cols(tid, sl):
        cf = coef_ref[pl.ds(tid * 4 * st, 4 * st), :]     # [4St, K]
        mm = jax.lax.dot_general(
            cf, f_stack[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [4St, Rc]
        det = mm[0 * st:1 * st]
        u_num = mm[1 * st:2 * st]
        v_num = mm[2 * st:3 * st]
        t_num = mm[3 * st:4 * st]
        ok_det = jnp.abs(det) >= _DET_EPS
        inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
        u = u_num * inv_det
        v = v_num * inv_det
        t = t_num * inv_det
        valid = (ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > min_t))
        t = jnp.where(valid, t, F32_MAX)
        if deferred:
            _merge_tile_deferred(t, tid, t_ref, g_ref, st, cols=sl)
        else:
            tl = attrs_ref[pl.ds(tid * st, st), :]        # [St, 17]
            _merge_tile(t, tl, t_ref, g_ref, st, cols=sl)

    sweep_tile = _gated_sweep(do_tile_cols, any_skip, n_sub, bxq_ref,
                              o3, inv3, seg_lo, cap, t_ref)
    _sweep_scheduled(sched_ref, tlo_ref, cap, sweep_tile, t_ref, g_ref,
                     early_exit)


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "st", "min_t", "ray_block",
                              "use_mxu", "interpret", "early_exit",
                              "any_skip", "n_sub", "deferred"))
def _tri_grid_raw(rays7, tile_attrs, tile_coeffs, mask, tlo, tile_boxes,
                  *, n_tiles, st, min_t, ray_block, use_mxu=True,
                  interpret=False, early_exit=True, any_skip=True,
                  n_sub=1, deferred=False):
    n = rays7.shape[1]
    nb = n // ray_block
    # Front-to-back schedule: active tiles first, ordered by their entry
    # bound (ties keep tile-id order — argsort is stable).  Inactive
    # tiles key to _TLO_PAD, past every capped active bound.
    key = jnp.where(mask > 0, jnp.minimum(tlo, _TLO_CAP), _TLO_PAD)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(mask > 0, axis=1, dtype=jnp.int32)
    sched = jnp.concatenate([count[:, None], order], axis=1)
    tlo_sorted = jnp.take_along_axis(key, order, axis=1)
    tlo_q = jnp.concatenate(
        [jnp.floor(tlo_sorted * _TLO_SCALE).astype(jnp.int32),
         jnp.full((nb, 1), np.int32(_TLO_PAD * _TLO_SCALE), jnp.int32)],
        axis=1)                                           # [NB, T+1]
    # Tile AABBs, conservatively quantized (floor lo / ceil hi only
    # EXPANDS a box — the any-touch skip can pass extra tiles, never
    # drop a touched one), padded 6 -> 8 cols for SMEM row alignment.
    bclip = jnp.clip(tile_boxes, -_BX_CLIP, _BX_CLIP) * _TLO_SCALE
    lo_q = jnp.floor(bclip[:, 0::2]).astype(jnp.int32) - 1  # [T, 3]
    hi_q = jnp.ceil(bclip[:, 1::2]).astype(jnp.int32) + 1
    bxq = jnp.zeros((n_tiles, 8), jnp.int32)
    bxq = bxq.at[:, 0:6:2].set(lo_q).at[:, 1:6:2].set(hi_q)

    in_specs = [
        pl.BlockSpec((7, ray_block), lambda i, m, q, b: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tiles * st, TRI_GRID_COLS),
                     lambda i, m, q, b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_mxu:
        # n_terms must match the limb stacking baked into the grid's
        # tile_coeffs (tri_accel.build_tri_grid uses _N_TERMS_TRI).
        from .tri_pallas_mxu import _N_TERMS_TRI
        kernel = functools.partial(_tri_grid_kernel_mxu, st=st,
                                   min_t=min_t, n_terms=_N_TERMS_TRI,
                                   early_exit=early_exit,
                                   any_skip=any_skip, n_sub=n_sub,
                                   deferred=deferred)
        k = tile_coeffs.shape[1]
        in_specs.append(
            pl.BlockSpec((n_tiles * 4 * st, k), lambda i, m, q, b: (0, 0),
                         memory_space=pltpu.VMEM))
        args = (sched, tlo_q, bxq, rays7, tile_attrs, tile_coeffs)
    else:
        kernel = functools.partial(_tri_grid_kernel, st=st, min_t=min_t,
                                   early_exit=early_exit,
                                   any_skip=any_skip, n_sub=n_sub,
                                   deferred=deferred)
        args = (sched, tlo_q, bxq, rays7, tile_attrs)

    g_rows, g_dtype = ((1, jnp.int32) if deferred
                       else (TRI_GRID_COLS, jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i, m, q, b: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, ray_block),
                         lambda i, m, q, b: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    # The whole-grid-resident operand tables (attrs ~1.4 MB + bf16 coeff
    # stacks ~0.8 KB/tri) blow past Mosaic's default 16 MB scoped-VMEM
    # budget at bunny scale; v5e VMEM is 128 MB, so raise the limit to
    # what the tables + block windows actually need (measured OOM at
    # 20k tris: job 234, 30.6 MB demanded).
    vmem_need = (tile_attrs.nbytes + tile_coeffs.nbytes
                 + 64 * ray_block * 4 + (1 << 21))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((g_rows, n), g_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 * (1 << 20),
                                 max(32 * (1 << 20), 2 * vmem_need))),
        interpret=interpret,
    )(*args)


def hit_triangles_grid_rows(
    grid: TriGridScene,
    origin: jnp.ndarray,     # [3, N]
    direction: jnp.ndarray,  # [3, N]
    time: jnp.ndarray,       # [1, N] (unused: meshes are static)
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_TRI_GRID_RAY_BLOCK,
    interpret: bool = False,
    t_cap: Optional[jnp.ndarray] = None,
    use_mxu: bool = True,
    early_exit: bool = True,
    any_skip: bool = True,
    n_sub: int = 1,
    gather: str = "fused",
) -> HitRecordRows:
    """Drop-in rows hit function for TriGridScene.  ``t_cap`` [1, N] (a
    nearer hit from another pass) tightens the block mask.  ``use_mxu``
    selects the production split-bf16 MXU tile sweep (False = the exact
    f32 VPU variant, the oracle-grade path).  ``early_exit`` sweeps each
    block's tiles front-to-back and stops at the first tile no lane can
    still beat (exact; False = full masked sweep, the A/B arm).
    ``gather`` selects the winner-attribute path (cfg.tri_gather):
    "fused" merges the 17 attribute rows in-kernel per swept tile;
    "deferred" carries only the winner's row index and fetches the rows
    once after the sweep (identical winners and tie-breaks, strictly
    less per-tile work).  ``any_skip`` gates each scheduled tile's
    contraction on an exact
    per-lane slab test against the tile AABB (pl.when — exact, since a
    tile no lane's capped-to-current-best segment touches cannot improve
    any winner; False = the unconditional sweep A/B arm).  ``n_sub`` > 1
    applies that gate per ray_block/n_sub-lane sub-group, each passing
    sub-group contracting only its own columns (cfg.tri_sub_gate; must
    divide ray_block into 128-lane multiples; ignored without
    ``any_skip``).

    Contract: a lane's record BEYOND its effective segment end (scene
    exit ∧ ``t_cap``) is unspecified — the unconditional sweep may
    report a junk winner there (a tile swept for other lanes' sake)
    where the gated sweep reports a farther one or a miss.  Harmless by
    construction: ``t_cap`` is a nearer hit from another pass, so the
    composite combine discards anything beyond it."""
    del time
    if gather not in ("fused", "deferred"):
        raise ValueError(f"gather must be fused|deferred, got {gather!r}")
    deferred = gather == "deferred"
    if n_sub > 1:
        if not any_skip:
            n_sub = 1
        elif ray_block % (128 * n_sub):
            raise ValueError(
                f"n_sub={n_sub} must divide ray_block={ray_block} into "
                f"128-lane multiples")
    n = origin.shape[1]
    pad = (-n) % ray_block
    o, d = origin, direction
    if pad:
        # Park filler rays below everything with an empty footprint.
        o = jnp.pad(o, ((0, 0), (0, pad))).at[1, n:].set(-1e9)
        d = jnp.pad(d, ((0, 0), (0, pad))).at[2, n:].set(1.0)
        if t_cap is not None:
            t_cap = jnp.pad(t_cap, ((0, 0), (0, pad)))

    mask, tlo, cap_eff = tri_block_schedule_rows(
        grid, o, d, t_cap, float(min_t), ray_block)
    rays7 = jnp.concatenate([o, d, cap_eff], axis=0)

    # Segment the batch so the SMEM-resident schedule fits (see module
    # doc); segments pipeline like any other dispatches.
    np_ = o.shape[1]
    nb = np_ // ray_block
    # The per-call-constant quantized box table ([T, 8] i32) eats into
    # the SMEM the double-buffered per-block schedule rows may use.
    budget = _SMEM_BUDGET - grid.n_tiles * 8 * 4
    per_seg = max(1, budget // ((2 * grid.n_tiles + 2) * 4 * 2))
    outs_t, outs_g = [], []
    for b0 in range(0, nb, per_seg):
        b1 = min(nb, b0 + per_seg)
        sl = slice(b0 * ray_block, b1 * ray_block)
        t_o, g_o = _tri_grid_raw(
            rays7[:, sl], grid.tile_attrs, grid.tile_coeffs, mask[b0:b1],
            tlo[b0:b1], grid.tile_boxes,
            n_tiles=grid.n_tiles, st=grid.tile_rows, min_t=float(min_t),
            ray_block=ray_block, use_mxu=use_mxu, interpret=interpret,
            early_exit=early_exit, any_skip=any_skip, n_sub=n_sub,
            deferred=deferred)
        outs_t.append(t_o)
        outs_g.append(g_o)
    t_out = jnp.concatenate(outs_t, axis=1) if len(outs_t) > 1 else outs_t[0]
    g = jnp.concatenate(outs_g, axis=1) if len(outs_g) > 1 else outs_g[0]
    if deferred:
        # One XLA gather replaces every in-kernel attribute merge: g is
        # the winner's [T*St]-table ROW INDEX (-1 = miss -> all-zero
        # rows, the fused kernel's miss encoding).
        widx = g
        tbl_t = grid.tile_attrs.T                     # [17, T*St]
        safe = jnp.clip(widx[0], 0, tbl_t.shape[1] - 1)
        g = jnp.take(tbl_t, safe, axis=1) * (widx >= 0)

    from ..ops.hit_tri import tri_record_rows_from_gather
    rec = tri_record_rows_from_gather(o, d, t_out, g)
    if pad:
        rec = HitRecordRows(*(x[:, :n] for x in rec))
    return rec
