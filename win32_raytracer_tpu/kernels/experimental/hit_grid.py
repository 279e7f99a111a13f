"""Pallas TPU grid-accelerated hit kernel.

Turns accel.footprint_block_mask's per-(ray-block, tile) mask into real
savings: the brute kernels (hit_pallas*.py) test every ray against every
sphere (the descendant of the reference AVX sweep, win32-raytracer/
RayTracer.cpp:433-551); here each ray block runs the same per-sphere
quadratic only over the tiles its footprint can touch.

Kernel shape (one pallas_call, grid over ray blocks only):

* all tile attribute rows stay VMEM-resident (``[T*St, 17]`` is tiny —
  the RTIOW scene is ~50 KB), so skipping a tile costs nothing;
* a ``fori_loop`` over tiles guards each tile's sweep with
  ``pl.when(mask[block, tile])`` — block-uniform control flow, the TPU
  analogue of the reference's movemask early-outs (RayTracer.cpp:479-483);
* the running (t, attrs) best is carried in the output refs; the winning
  attribute row is fetched with a one-hot MXU contraction whose extra
  all-ones column doubles as the "this tile won" lane flag, so the carry
  merge needs no lane<->sublane transpose.

Pass A (the handful of global spheres) reuses the brute v3 kernel at a
tiny sphere count; merge and HitRecord assembly live in accel.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...accel import (
    GRID_ATTR_COLS, GridScene, assemble_hit_record, footprint_block_mask,
    merge_best,
)
from ...config import MIN_HIT_T
from ...ops.hit import (
    ATTR_COLS, F32_MAX,
    _A_T1, _A_INVDT, _A_RADIUS, _A_C1X, _A_C1Z, _A_DCX, _A_DCZ,
)
from ..hit_pallas_v3 import _hit_pallas_v3_raw

DEFAULT_RAY_BLOCK_GRID = 2048


def _grid_kernel(sched_ref, rays_ref, attrs_ref, t_ref, g_ref,
                 *, n_tiles, st, min_t):
    """sched [NB, 1+T] i32 (scalar-prefetch SMEM): col 0 = active-tile
    count, cols 1.. = active tile ids ascending — the loop runs exactly
    `count` branch-free iterations (a branch per *possible* tile costs
    ~1us each on the scalar unit and was the dominant cost of the bitmask
    formulation).  rays [8, R] rows (ox,oy,oz,dx,dy,dz,tm,|d|^2); attrs
    [T*St, 17] resident; outputs: t [1, R], attrs row [R, 17]."""
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

        # [St,R]^T-contract [St,17] -> [R,17]; the ones column returns
        # the per-lane "better" flag in column 16 — the no-transpose
        # carry merge.
        delta = jax.lax.dot_general(
            onehot, tl,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [R, 17]
        flag = delta[:, ATTR_COLS:ATTR_COLS + 1]            # [R, 1]
        g_ref[:, :] = g_ref[:, :] * (1.0 - flag) + delta
        t_ref[:, :] = jnp.where(better, tile_t, t_ref[:, :])
        return carry

    jax.lax.fori_loop(0, sched_ref[i, 0], body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "st", "min_t", "ray_block",
                              "interpret"))
def _hit_grid_raw(rays_t, tile_attrs, mask, *, n_tiles, st, min_t,
                  ray_block, interpret=False):
    n = rays_t.shape[1]
    nb = n // ray_block
    kernel = functools.partial(_grid_kernel, n_tiles=n_tiles, st=st,
                               min_t=min_t)
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
            pl.BlockSpec((ray_block, GRID_ATTR_COLS), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((n, GRID_ATTR_COLS), jnp.float32),
        ],
        interpret=interpret,
    )(sched, rays_t, tile_attrs)


def hit_spheres_grid_pallas(
    gscene: GridScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_RAY_BLOCK_GRID,
    interpret: bool = False,
):
    """Drop-in hit function for GridScene scenes (ops.hit signature)."""
    n = origin.shape[0]
    pad = (-n) % ray_block
    a = jnp.sum(direction * direction, axis=1)
    rays = jnp.concatenate(
        [origin, direction, time[:, None], a[:, None]], axis=1)
    if pad:
        # Park filler rays below everything with an empty footprint.
        filler = (jnp.zeros((pad, 8), jnp.float32)
                  .at[:, 1].set(-1e9).at[:, 7].set(1.0))
        rays = jnp.concatenate([rays, filler], axis=0)
    rays_t = rays.T

    # Pass A: globals via the brute v3 kernel at a tiny sphere count.
    t_g, row_g = _hit_pallas_v3_raw(
        rays_t, gscene.glob_attrs, min_t=float(min_t), ray_block=ray_block,
        interpret=interpret)
    t_g = t_g[0]

    mask = footprint_block_mask(
        gscene, rays[:, 0:3], rays[:, 3:6], t_g, float(min_t), ray_block)

    t_b, row_b = _hit_grid_raw(
        rays_t, gscene.tile_attrs, mask,
        n_tiles=gscene.n_tiles, st=gscene.tile_rows, min_t=float(min_t),
        ray_block=ray_block, interpret=interpret)

    t_m, row_m = merge_best(t_g, row_g, t_b[0], row_b[:, :ATTR_COLS])
    return assemble_hit_record(origin, direction, time,
                               t_m[:n], row_m[:n])
