"""Pallas TPU grid-accelerated hit kernel, lane-major in AND out.

The rows-layout production variant of kernels/hit_grid.py for the
persistent scheduler (persistent.py): the same two-pass design — pass A
sweeps the handful of global spheres (ground + heroes), a conservative
per-(ray-block, tile) footprint mask then schedules pass B over only the
grid tiles a block can touch — but every array stays lane-major ([3, N]
vectors, [1, N] scalars, ops/rows.py), so there are no transposes at the
kernel boundary and the winner-gather contraction emits attribute ROWS
([17, R]) exactly like hit_pallas_v4.

Candidate reduction is the descendant of... nothing in the reference: the
AVX sweep tests every sphere against every ray (win32-raytracer/
RayTracer.cpp:433-551, the TODO at 432-434 even drops the remainder).  On
the RTIOW final scene (~488 spheres in a 22x22 (x, z) lattice) the
footprint mask leaves ~2-6 active tiles of ~2 rows per ray block instead
of 64 brute rows — the single biggest lever identified in
docs/perf_roadmap.md.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel import GRID_ATTR_COLS, GridScene
from ..config import MIN_HIT_T
from ..ops.hit import (
    ATTR_COLS, F32_MAX, _A_IDX,
    _A_T1, _A_INVDT, _A_RADIUS, _A_C1X, _A_C1Z, _A_DCX, _A_DCZ,
)
from ..ops.rows import HitRecordRows
from .hit_pallas_v4 import (
    _hit_pallas_v4_raw, assemble_hit_record_rows, pack_rays_rows,
)

DEFAULT_RAY_BLOCK_GRID_ROWS = 2048

_BIG = np.float32(1e8)


def footprint_block_mask_rows(
    gscene: GridScene,
    origin: jnp.ndarray,      # [3, Np] (padded to a ray_block multiple)
    direction: jnp.ndarray,   # [3, Np]
    t_cap: jnp.ndarray,       # [1, Np] nearest global-hit t (F32_MAX = none)
    min_t: float,
    ray_block: int,
) -> jnp.ndarray:
    """[Np/ray_block, T] int32 — rows twin of accel.footprint_block_mask.

    Per ray: the t-interval where it overlaps the gridded y-slab, clipped
    to [min_t, t_cap] (a global hit occludes anything farther), swept into
    an (x, z) interval; per block: min/max over rays; per (block, tile):
    box overlap.  Conservative — never skips a possible hit.
    """
    n = origin.shape[1]
    nb = n // ray_block
    y_lo, y_hi = gscene.y_slab[0], gscene.y_slab[1]

    ox, oy, oz = origin[0], origin[1], origin[2]
    dx, dy, dz = direction[0], direction[1], direction[2]

    eps = np.float32(1e-12)
    dy_safe = jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    ta = (y_lo - oy) / dy_safe
    tb = (y_hi - oy) / dy_safe
    lo_t = jnp.maximum(jnp.minimum(ta, tb), np.float32(min_t))
    hi_t = jnp.minimum(jnp.maximum(ta, tb), jnp.minimum(t_cap[0], _BIG))
    empty = lo_t > hi_t

    xa, xb = ox + lo_t * dx, ox + hi_t * dx
    za, zb = oz + lo_t * dz, oz + hi_t * dz
    x_min = jnp.where(empty, _BIG, jnp.minimum(xa, xb))
    x_max = jnp.where(empty, -_BIG, jnp.maximum(xa, xb))
    z_min = jnp.where(empty, _BIG, jnp.minimum(za, zb))
    z_max = jnp.where(empty, -_BIG, jnp.maximum(za, zb))

    bx_min = x_min.reshape(nb, ray_block).min(axis=1)   # [NB]
    bx_max = x_max.reshape(nb, ray_block).max(axis=1)
    bz_min = z_min.reshape(nb, ray_block).min(axis=1)
    bz_max = z_max.reshape(nb, ray_block).max(axis=1)

    bx = gscene.tile_boxes  # [T, 4]
    overlap = ((bx_min[:, None] <= bx[None, :, 1])
               & (bx_max[:, None] >= bx[None, :, 0])
               & (bz_min[:, None] <= bx[None, :, 3])
               & (bz_max[:, None] >= bx[None, :, 2]))
    return overlap.astype(jnp.int32)                     # [NB, T]


def _grid_kernel_rows(sched_ref, rays_ref, attrs_ref, t_ref, g_ref,
                      *, st, min_t):
    """sched [NB, 1+T] i32 (scalar-prefetch SMEM): col 0 = active-tile
    count, cols 1.. = active tile ids ascending; the fori_loop runs exactly
    `count` iterations (hit_grid.py's branch-free schedule).  rays [8, R]
    rows; attrs [T*St, 17] VMEM-resident; outputs t [1, R] and winner
    attribute ROWS [17, R] — the ones column doubles as the per-lane
    "this tile won" flag so the carry merge is transpose-free."""
    i = pl.program_id(0)
    t_ref[:, :] = jnp.full_like(t_ref[:, :], F32_MAX)
    g_ref[:, :] = jnp.zeros_like(g_ref[:, :])

    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tm = rays_ref[6:7, :]
    a = rays_ref[7:8, :]

    def body(j, carry):
        tid = sched_ref[i, 1 + j]
        tl = attrs_ref[pl.ds(tid * st, st), :]             # [St, 17]

        def col(c):
            return tl[:, c:c + 1]                          # [St, 1]

        lerp = (tm - col(_A_T1)) * col(_A_INVDT)           # [St, R]
        cx = col(_A_C1X) + col(_A_DCX) * lerp
        cy = col(_A_C1X + 1) + col(_A_DCX + 1) * lerp
        cz = col(_A_C1Z) + col(_A_DCZ) * lerp
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b_half = dx * ocx + dy * ocy + dz * ocz
        r = col(_A_RADIUS)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b_half * b_half - a * c
        t = (-b_half - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
        valid = (disc >= 0.0) & (t > min_t) & (r != 0.0)
        t = jnp.where(valid, t, F32_MAX)                   # [St, R]

        tile_t = jnp.min(t, axis=0, keepdims=True)         # [1, R]
        better = tile_t < t_ref[:, :]                      # [1, R]
        eq = t == tile_t
        sub = jax.lax.broadcasted_iota(
            jnp.int32, t.shape, 0).astype(jnp.float32)
        big = jnp.float32(st + 1)
        winner = jnp.min(jnp.where(eq, sub, big), axis=0, keepdims=True)
        onehot = ((sub == winner) & better).astype(jnp.float32)

        # [St,17]^T-contract [St,R] -> [17,R] on the MXU; row 16 (the
        # all-ones column) returns the per-lane "better" flag.
        delta = jax.lax.dot_general(
            tl, onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [17, R]
        flag = delta[ATTR_COLS:ATTR_COLS + 1, :]            # [1, R]
        g_ref[:, :] = g_ref[:, :] * (1.0 - flag) + delta
        t_ref[:, :] = jnp.where(better, tile_t, t_ref[:, :])
        return carry

    jax.lax.fori_loop(0, sched_ref[i, 0], body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "st", "min_t", "ray_block",
                              "interpret"))
def _hit_grid_rows_raw(rays_t, tile_attrs, mask, *, n_tiles, st, min_t,
                       ray_block, interpret=False):
    n = rays_t.shape[1]
    nb = n // ray_block
    # The schedule is scalar-prefetched: the WHOLE [NB, 1+T] i32 array is
    # SMEM-resident (double-buffered), and SMEM is 1 MB.  Guard with a
    # clear error instead of the compile service's HTTP 500.
    smem = nb * (1 + n_tiles) * 4 * 2
    if smem > 768 * 1024:
        raise ValueError(
            f"grid hit schedule needs ~{smem >> 10} KiB SMEM "
            f"(NB={nb} x (1+T={1 + n_tiles}) i32, double-buffered) > 768 KiB"
            f" — raise ray_block or split the batch")
    kernel = functools.partial(_grid_kernel_rows, st=st, min_t=min_t)
    # Active-tile schedule: [NB, 1+T] i32 — col 0 = count, cols 1.. =
    # active tile ids ascending (argsort puts active-tile keys first).
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    key = jnp.where(mask > 0, t_ids, n_tiles + t_ids)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(mask > 0, axis=1, dtype=jnp.int32)
    sched = jnp.concatenate([count[:, None], order], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles * st, GRID_ATTR_COLS), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRID_ATTR_COLS, ray_block), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((GRID_ATTR_COLS, n), jnp.float32),
        ],
        interpret=interpret,
    )(sched, rays_t, tile_attrs)


def hit_spheres_grid_rows(
    gscene: GridScene,
    origin: jnp.ndarray,     # [3, N]
    direction: jnp.ndarray,  # [3, N]
    time: jnp.ndarray,       # [1, N]
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_RAY_BLOCK_GRID_ROWS,
    interpret: bool = False,
) -> HitRecordRows:
    """Drop-in rows hit function (ops.rows interface) for GridScene scenes."""
    n = origin.shape[1]
    pad = (-n) % ray_block
    rays_t = pack_rays_rows(origin, direction, time)
    if pad:
        # Park filler rays below everything with an empty footprint.
        filler = (jnp.zeros((8, pad), jnp.float32)
                  .at[1, :].set(-1e9).at[5, :].set(1.0).at[7, :].set(1.0))
        rays_t = jnp.concatenate([rays_t, filler], axis=1)

    # Pass A: globals via the brute v4 kernel at a tiny sphere count.
    t_g, gt_g = _hit_pallas_v4_raw(
        rays_t, gscene.glob_attrs, min_t=float(min_t), ray_block=ray_block,
        interpret=interpret)

    mask = footprint_block_mask_rows(
        gscene, rays_t[0:3], rays_t[3:6], t_g, float(min_t), ray_block)

    t_b, g_b = _hit_grid_rows_raw(
        rays_t, gscene.tile_attrs, mask,
        n_tiles=gscene.n_tiles, st=gscene.tile_rows, min_t=float(min_t),
        ray_block=ray_block, interpret=interpret)

    # Lexicographic (t, original index) merge — accel.merge_best in rows.
    better = ((t_b < t_g)
              | ((t_b == t_g)
                 & (g_b[_A_IDX:_A_IDX + 1] < gt_g[_A_IDX:_A_IDX + 1])))
    t_m = jnp.where(better, t_b, t_g)
    gt = jnp.where(better, g_b[:ATTR_COLS], gt_g)

    rec = assemble_hit_record_rows(
        rays_t[0:3], rays_t[3:6], rays_t[6:7], t_m, gt)
    if pad:
        rec = HitRecordRows(*(x[:, :n] for x in rec))
    return rec
