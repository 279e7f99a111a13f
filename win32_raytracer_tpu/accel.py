"""Uniform-grid acceleration structure for the sphere hit sweep.

The reference tests every ray against every sphere (the brute-force AVX
sweep, win32-raytracer/RayTracer.cpp:433-551).  That is also what our
baseline kernels do, and at 512 spheres it is ~75% of render time.  This
module cuts the candidate set the TPU way — with *block-uniform* control
flow instead of per-ray divergence:

* Spheres are split into **globals** (large: the ground sphere, heroes —
  anything whose footprint spans many cells) and **gridded** (small), the
  latter binned into supercell *tiles* over the (x, z) plane.  Tile AABBs
  are conservative: they include motion-blur extent over the camera's
  shutter window and the (signed) radius.
* Pass A tests only the global tile (a few spheres instead of hundreds).
* Each ray then gets a conservative **footprint**: the (x, z) interval it
  sweeps while inside the gridded spheres' y-slab, clipped to ``t`` of its
  nearest global hit (anything farther is occluded).  Footprints are
  reduced per ray-block (min/max), and a block tests a tile in pass B only
  if the block's footprint box overlaps the tile's AABB.
* Pass B runs the same per-sphere quadratic as the brute kernels over the
  unmasked tiles only, so the winning hit is numerically identical to the
  brute-force sweep (tie-break caveat in :func:`merge_hits`).

Everything here is correctness-first conservative: a tile is skipped only
if NO ray in the block can intersect its AABB at an unoccluded ``t``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from .config import MIN_HIT_T
from .ops.hit import (
    ATTR_COLS, F32_MAX, HitRecord,
    _A_T1, _A_INVDT, _A_RADIUS, _A_MAT, _A_ALR, _A_ALB, _A_FUZZ, _A_IOR,
    _A_IDX, _A_C1X, _A_C1Z, _A_DCX, _A_DCZ,
)
from .scene.spheres import SphereScene

# Grid-tile attribute matrices carry one extra all-ones column so a single
# one-hot MXU contraction also returns the "this tile won" flag (used to
# merge the running best without any lane<->sublane transpose).
GRID_ATTR_COLS = ATTR_COLS + 1  # 17: [.. ATTR_COLS fields .., ones]

_BIG = np.float32(1e8)          # t / coordinate clamp for open footprints


class GridScene(NamedTuple):
    """A SphereScene plus its uniform-grid acceleration arrays.

    Drop-in ``scene`` argument for the render paths: ``scatter`` ignores
    scene fields (material params ride in the HitRecord), and the grid hit
    functions consume the accel arrays.  ``base`` is untouched, so brute
    kernels and the scene API keep working on ``gscene.base``.
    """

    base: SphereScene
    glob_attrs: jnp.ndarray   # [Sg, ATTR_COLS] global spheres (orig. idx col)
    tile_attrs: jnp.ndarray   # [T * St, GRID_ATTR_COLS] tiles, row-major
    tile_boxes: jnp.ndarray   # [T, 4] f32: x_lo, x_hi, z_lo, z_hi
    y_slab: jnp.ndarray       # [2] f32: y_lo, y_hi over all gridded spheres

    @property
    def padded_size(self) -> int:
        return self.base.padded_size

    @property
    def n_tiles(self) -> int:
        return self.tile_boxes.shape[0]

    @property
    def tile_rows(self) -> int:
        return self.tile_attrs.shape[0] // self.tile_boxes.shape[0]


def _attr_rows(scene_np: dict, sel: np.ndarray, cols: int) -> np.ndarray:
    """Packed attribute rows (ops.hit._attr_matrix layout) for sphere
    indices ``sel``, with the ORIGINAL scene index in the idx column."""
    out = np.zeros((len(sel), cols), np.float32)
    c1, c2 = scene_np["center1"][sel], scene_np["center2"][sel]
    out[:, _A_C1X:_A_C1Z + 1] = c1
    out[:, _A_DCX:_A_DCZ + 1] = c2 - c1
    out[:, _A_T1] = scene_np["t1"][sel]
    out[:, _A_INVDT] = 1.0 / (scene_np["t2"][sel] - scene_np["t1"][sel])
    out[:, _A_RADIUS] = scene_np["radius"][sel]
    out[:, _A_MAT] = scene_np["mat_id"][sel]
    out[:, _A_ALR:_A_ALB + 1] = scene_np["albedo"][sel]
    out[:, _A_FUZZ] = scene_np["fuzz"][sel]
    out[:, _A_IOR] = scene_np["ior"][sel]
    out[:, _A_IDX] = sel
    if cols > ATTR_COLS:
        out[:, ATTR_COLS] = 1.0  # ones column (winner flag via MXU)
    return out


def _pad_rows(rows: np.ndarray, to: int) -> np.ndarray:
    """Pad attribute rows with inactive spheres (radius 0, parked far away
    so even degenerate tests cannot hit — mirrors SceneBuilder padding)."""
    pad = to - len(rows)
    if pad <= 0:
        return rows
    filler = np.zeros((pad, rows.shape[1]), np.float32)
    filler[:, _A_C1X + 1] = -1.0e8   # park below everything
    filler[:, _A_INVDT] = 1.0
    if rows.shape[1] > ATTR_COLS:
        filler[:, ATTR_COLS] = 1.0
    return np.concatenate([rows, filler], axis=0)


_SGRID_CACHE: dict = {}
_SGRID_CACHE_MAX = 8


def build_grid_accel(
    scene: SphereScene,
    time_hi: float = 1.0,
    target_per_tile: int = 16,
    global_radius_factor: float = 3.0,
    max_tile_rows: int = 64,
    min_gridded: int = 64,
) -> Optional[GridScene]:
    """Build a :class:`GridScene`, or None when the scene doesn't benefit
    (too few small spheres, or a tile would overflow ``max_tile_rows``).

    ``time_hi`` bounds the shutter window actually sampled (the default
    camera's shutter is [0, 0.05], RayTracer.cpp:233-234); motion extents
    are evaluated over [0, time_hi] — pass the camera's shutter_close.

    Memoized on the scene object's identity (the hit dispatcher resolves
    accel per render call; same pattern as tri_accel._GRID_CACHE — the
    cached GridScene's ``base`` holds the scene ref that keeps the id
    key valid).
    """
    key = (id(scene), time_hi, target_per_tile, global_radius_factor,
           max_tile_rows, min_gridded)
    cached = _SGRID_CACHE.get(key)
    if cached is not None and cached.base is scene:
        return cached
    sc = {f: np.asarray(getattr(scene, f)) for f in scene._fields}
    active = np.flatnonzero(sc["active"])
    if len(active) == 0:
        return None
    r = np.abs(sc["radius"][active])

    # Centers at the shutter endpoints (motion is linear in time).
    inv_dt = 1.0 / (sc["t2"][active] - sc["t1"][active])
    l0 = (0.0 - sc["t1"][active]) * inv_dt
    l1 = (time_hi - sc["t1"][active]) * inv_dt
    c1, c2 = sc["center1"][active], sc["center2"][active]
    dc = c2 - c1
    p0 = c1 + dc * l0[:, None]
    p1 = c1 + dc * l1[:, None]
    lo = np.minimum(p0, p1) - r[:, None]
    hi = np.maximum(p0, p1) + r[:, None]

    med_r = float(np.median(r))
    is_global = r > global_radius_factor * max(med_r, 1e-6)
    gridded = active[~is_global]
    globals_ = active[is_global]
    if len(gridded) < min_gridded:
        return None

    glo = lo[~is_global]
    ghi = hi[~is_global]
    # (x, z) tile lattice sized for ~target_per_tile spheres per tile.
    cx = 0.5 * (glo[:, 0] + ghi[:, 0])
    cz = 0.5 * (glo[:, 2] + ghi[:, 2])
    x0, x1 = float(cx.min()), float(cx.max())
    z0, z1 = float(cz.min()), float(cz.max())
    n_tiles_target = max(1, len(gridded) // target_per_tile)
    # Near-square tiling of the (x, z) box.
    aspect = max((x1 - x0), 1e-6) / max((z1 - z0), 1e-6)
    tz = max(1, int(round(np.sqrt(n_tiles_target / max(aspect, 1e-6)))))
    tx = max(1, -(-n_tiles_target // tz))

    ix = np.clip(((cx - x0) / max(x1 - x0, 1e-6) * tx).astype(int), 0, tx - 1)
    iz = np.clip(((cz - z0) / max(z1 - z0, 1e-6) * tz).astype(int), 0, tz - 1)
    tid = ix * tz + iz
    t_count = np.bincount(tid, minlength=tx * tz)
    st = -(-int(t_count.max()) // 8) * 8  # pad rows to sublane multiple
    if st == 0 or st > max_tile_rows:
        return None

    n_t = tx * tz
    tiles = np.zeros((n_t, st, GRID_ATTR_COLS), np.float32)
    boxes = np.zeros((n_t, 4), np.float32)
    for t in range(n_t):
        # Increasing original index inside each tile => within-tile ties
        # resolve to the earliest index, like the brute sweep.
        sel = gridded[tid == t]
        rows = _attr_rows(sc, sel, GRID_ATTR_COLS)
        tiles[t] = _pad_rows(rows, st)
        if len(sel):
            m = np.isin(gridded, sel)
            boxes[t] = (glo[m][:, 0].min(), ghi[m][:, 0].max(),
                        glo[m][:, 2].min(), ghi[m][:, 2].max())
        else:
            boxes[t] = (1e9, -1e9, 1e9, -1e9)  # never overlaps

    y_lo = float(glo[:, 1].min())
    y_hi = float(ghi[:, 1].max())

    sg = max(8, -(-len(globals_) // 8) * 8)
    gl = _pad_rows(_attr_rows(sc, globals_, ATTR_COLS), sg)

    out = GridScene(
        base=scene,
        glob_attrs=jnp.asarray(gl),
        tile_attrs=jnp.asarray(tiles.reshape(n_t * st, GRID_ATTR_COLS)),
        tile_boxes=jnp.asarray(boxes),
        y_slab=jnp.asarray(np.array([y_lo, y_hi], np.float32)),
    )
    if len(_SGRID_CACHE) >= _SGRID_CACHE_MAX:
        _SGRID_CACHE.pop(next(iter(_SGRID_CACHE)))
    _SGRID_CACHE[key] = out
    return out


def footprint_block_mask(
    gscene: GridScene,
    origin: jnp.ndarray,      # [N, 3] (padded to a ray_block multiple)
    direction: jnp.ndarray,   # [N, 3]
    t_cap: jnp.ndarray,       # [N] nearest global-hit t (F32_MAX = none)
    min_t: float,
    ray_block: int,
) -> jnp.ndarray:
    """[N/ray_block, T] int32: 1 where the block must test the tile.

    Per ray: the t-interval where it overlaps the gridded y-slab, clipped
    to [min_t, t_cap] (a global hit occludes anything farther), swept into
    an (x, z) interval; per block: min/max over rays; per (block, tile):
    box overlap.  All conservative — never skips a possible hit.
    """
    n = origin.shape[0]
    nb = n // ray_block
    y_lo, y_hi = gscene.y_slab[0], gscene.y_slab[1]

    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]

    eps = np.float32(1e-12)
    dy_safe = jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    ta = (y_lo - oy) / dy_safe
    tb = (y_hi - oy) / dy_safe
    lo_t = jnp.maximum(jnp.minimum(ta, tb), np.float32(min_t))
    hi_t = jnp.minimum(jnp.maximum(ta, tb), jnp.minimum(t_cap, _BIG))
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


def _sweep_attr_rows(attrs, origin, direction, time, min_t):
    """Nearest hit of [N] rays against attribute rows [S, C]; returns
    (t [N], row [N, C]).  Same quadratic/one-hot math as ops.hit."""
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    a = dx * dx + dy * dy + dz * dz
    tcol = time[:, None]

    lerp = (tcol - attrs[:, _A_T1][None, :]) * attrs[:, _A_INVDT][None, :]
    cx = attrs[:, _A_C1X][None, :] + attrs[:, _A_DCX][None, :] * lerp
    cy = attrs[:, _A_C1X + 1][None, :] + attrs[:, _A_DCX + 1][None, :] * lerp
    cz = attrs[:, _A_C1Z][None, :] + attrs[:, _A_DCZ][None, :] * lerp
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    b_half = dx * ocx + dy * ocy + dz * ocz
    r = attrs[:, _A_RADIUS][None, :]
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b_half * b_half - a * c
    t = (-b_half - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
    valid = (disc >= 0.0) & (t > min_t) & (r != 0.0)
    t = jnp.where(valid, t, F32_MAX)

    t_min = jnp.min(t, axis=1)                           # [N]
    eq = (t == t_min[:, None]).astype(jnp.float32)
    onehot = eq * (jnp.cumsum(eq, axis=1) == 1.0)
    row = jnp.dot(onehot, attrs, preferred_element_type=jnp.float32)
    return t_min, row


def assemble_hit_record(origin, direction, time, best_t, best_a) -> HitRecord:
    """HitRecord from a winning attribute row (ops.hit epilogue)."""
    hit = best_t < F32_MAX
    t_safe = jnp.where(hit, best_t, 0.0)
    point = origin + t_safe[:, None] * direction
    lerp = (time - best_a[:, _A_T1]) * best_a[:, _A_INVDT]
    center = (best_a[:, _A_C1X:_A_C1Z + 1]
              + best_a[:, _A_DCX:_A_DCZ + 1] * lerp[:, None])
    radius = best_a[:, _A_RADIUS]
    denom = jnp.where(radius == 0.0, 1.0, radius)
    normal = (point - center) / denom[:, None]
    return HitRecord(
        hit=hit, t=best_t, point=point, normal=normal,
        idx=best_a[:, _A_IDX].astype(jnp.int32),
        mat_id=best_a[:, _A_MAT].astype(jnp.int32),
        albedo=best_a[:, _A_ALR:_A_ALB + 1],
        fuzz=best_a[:, _A_FUZZ], ior=best_a[:, _A_IOR],
    )


def merge_best(t_a, row_a, t_b, row_b):
    """Lexicographic (t, original index) merge of two running bests.

    Exact-t ties between different spheres pick the smaller original index,
    matching the brute sweep's earliest-index rule (RayTracer.cpp:576-589).
    (Within pass B, cross-tile ties resolve by tile visit order instead —
    measure-zero for real geometry; within-tile order is index-sorted.)
    """
    better = (t_b < t_a) | ((t_b == t_a) & (row_b[:, _A_IDX] < row_a[:, _A_IDX]))
    t = jnp.where(better, t_b, t_a)
    row = jnp.where(better[:, None], row_b, row_a)
    return t, row


def hit_spheres_grid_jnp(
    gscene: GridScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    min_t: float = MIN_HIT_T,
    ray_block: int = 512,
) -> HitRecord:
    """Pure-jnp grid hit — the oracle for the Pallas grid kernel, and the
    CPU-testable proof that footprint masking is conservative (it must be
    bit-identical to the brute sweep up to the tie rule).

    Masked tiles are *computed then discarded* here (jnp can't skip);
    only the Pallas version converts the mask into real savings.
    """
    n = origin.shape[0]
    pad = (-n) % ray_block
    if pad:
        filler_o = jnp.zeros((pad, 3), jnp.float32).at[:, 1].set(-1e9)
        origin_p = jnp.concatenate([origin, filler_o], axis=0)
        direction_p = jnp.concatenate(
            [direction, jnp.zeros((pad, 3), jnp.float32).at[:, 2].set(1.0)],
            axis=0)
        time_p = jnp.concatenate([time, jnp.zeros((pad,), jnp.float32)])
    else:
        origin_p, direction_p, time_p = origin, direction, time

    t_g, row_g = _sweep_attr_rows(gscene.glob_attrs, origin_p, direction_p,
                                  time_p, min_t)
    mask = footprint_block_mask(gscene, origin_p, direction_p, t_g,
                                min_t, ray_block)        # [NB, T]

    n_t, st = gscene.n_tiles, gscene.tile_rows
    nb = origin_p.shape[0] // ray_block
    lane_mask = jnp.repeat(mask, ray_block, axis=0)      # [Np, T]

    best_t = jnp.full((origin_p.shape[0],), F32_MAX)
    best_row = jnp.zeros((origin_p.shape[0], GRID_ATTR_COLS), jnp.float32)
    for t_i in range(n_t):
        attrs = gscene.tile_attrs[t_i * st:(t_i + 1) * st]
        tt, trow = _sweep_attr_rows(attrs, origin_p, direction_p, time_p,
                                    min_t)
        on = lane_mask[:, t_i] > 0
        better = on & (tt < best_t)                      # tile visit order
        best_t = jnp.where(better, tt, best_t)
        best_row = jnp.where(better[:, None], trow, best_row)

    t_m, row_m = merge_best(t_g, row_g,
                            best_t[:origin_p.shape[0]],
                            best_row[:, :ATTR_COLS])
    return assemble_hit_record(origin, direction, time,
                               t_m[:n], row_m[:n])
