#!/usr/bin/env python
"""Price an any-touch-gated SPHERE grid against the brute v7 sweep.

Round 1 measured the sphere grid a LOSS on bounce batches: per-block
footprint unions cover ~17.6/30 tiles, so pass B degenerates toward
brute at per-tile fixed cost.  That is the same union-degeneracy disease
the triangle any-touch skip treats (kernels/tri_grid_rows._any_touch):
gate each scheduled tile on an exact per-lane slab test, bound by pass
A's global-sphere t (static) and the running best (progressive).

This sim counts, per ray block on REAL bounce-ray snapshots of the
headline scene (RTIOW final, the tri_knob_sim methodology):

* brute pair-rows/lane: the padded sphere count the v7 sweep pays;
* scheduled: the conservative footprint mask union
  (kernels/hit_grid_rows.footprint_block_mask_rows) x tile_rows;
* gated-static: tiles >= 1 lane's [min_t, t_glob] segment touches
  ((x,z) tile box x y-slab), x tile_rows — what the in-kernel gate
  skips to with only pass A's cap;
* gated-progressive: cap further min'd with the TRUE final best t
  (optimistic bound on the running-t_ref gate).

Block count and lane order are UNCHANGED by the gate, so these ratios
rank (the job-540 lesson: only block-count knobs are chip-only).
Per-tile sweep cost is VPU-quadratic (~30 slots x St rows) vs ~25
slots for the gate, so skipped tiles are ~St*30/25 ~ 20x cheaper.
"""

import os
import sys
import time

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
from win32_raytracer_tpu._cache import enable_compile_cache

enable_compile_cache()

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

from win32_raytracer_tpu.accel import build_grid_accel
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.dispatch import get_hit_fn_rows_accel
from win32_raytracer_tpu.kernels.hit_grid_rows import (
    footprint_block_mask_rows,
)
from win32_raytracer_tpu.ops.hit import (
    _A_C1X, _A_DCX, _A_INVDT, _A_RADIUS, _A_T1, F32_MAX, hit_spheres,
)
from win32_raytracer_tpu.persistent import (
    PathState, p_hit_step, p_respawn_step, p_scatter_respawn_step,
)
from win32_raytracer_tpu.scene.builders import random_scene
from win32_raytracer_tpu.scene.camera import default_camera

W = int(os.environ.get("SAS_W", 320))
H = int(os.environ.get("SAS_H", 200))
DEPTHS = (0, 1, 2, 4, 7)
RB = int(os.environ.get("SAS_RB", 2048))
MIN_T = 0.001


def collect_snapshots():
    """March one sample per pixel through the exact jnp physics on the
    RTIOW final scene; the tri_knob_sim.collect_snapshots twin."""
    cfg = RenderConfig(width=W, height=H, samples=1, seed=3, backend="jnp")
    scene = random_scene()
    cam = default_camera(W, H)
    rscene, hit_fn = get_hit_fn_rows_accel(cfg, scene, cam)
    n = W * H
    z1 = jnp.zeros((1, n), jnp.float32)
    z3 = jnp.zeros((3, n), jnp.float32)
    st = PathState(
        origin=z3, direction=z3.at[2, :].set(1.0), time=z1,
        throughput=jnp.ones((3, n), jnp.float32), radiance_sum=z3,
        depth=jnp.zeros((1, n), jnp.int32),
        sample=jnp.full((1, n), -1, jnp.int32),
        pixel=jnp.arange(n, dtype=jnp.int32)[None],
        path_alive=jnp.zeros((1, n), bool),
        s_base=jnp.zeros((1, n), jnp.int32),
        s_quota=jnp.ones((1, n), jnp.int32),
    )
    st = p_respawn_step(cam, st, jnp.uint32(7), jnp.int32(0), cfg=cfg,
                        width=W, height=H, spp=1)
    snaps = []
    for depth in range(max(DEPTHS) + 1):
        if depth in DEPTHS:
            alive = np.asarray(st.path_alive[0])
            snaps.append((depth, np.asarray(st.origin),
                          np.asarray(st.direction), np.asarray(st.time),
                          alive))
            print(f"# depth {depth}: alive {alive.mean():.3f}", flush=True)
        rec, st = p_hit_step(rscene, st, cfg=cfg, hit_fn=hit_fn)
        st = p_scatter_respawn_step(
            rscene, cam, st, rec, jnp.uint32(7), jnp.int32(depth + 1),
            cfg=cfg, width=W, height=H, spp=1)
    return scene, snaps


def snapshots_cached():
    path = f"/tmp/sas_snaps_{W}x{H}.npz"
    scene = random_scene()
    if os.path.exists(path):
        with np.load(path) as z:
            snaps = [(int(d), z[f"o{d}"], z[f"d{d}"], z[f"t{d}"],
                      z[f"a{d}"]) for d in z["depths"]]
        print(f"# snapshots from cache {path}", flush=True)
        return scene, snaps
    scene2, snaps = collect_snapshots()
    payload = {"depths": np.asarray([s[0] for s in snaps])}
    for d, o, dd, tm, al in snaps:
        payload.update({f"o{d}": o, f"d{d}": dd, f"t{d}": tm, f"a{d}": al})
    np.savez(path, **payload)
    return scene2, snaps


def glob_t(gscene, o, d, tm):
    """Pass A oracle: nearest valid t over the global spheres (numpy
    twin of the v4 sweep over glob_attrs)."""
    ga = np.asarray(gscene.glob_attrs, np.float64)         # [Sg, 16]
    lerp = (tm[0][None, :] - ga[:, _A_T1, None]) * ga[:, _A_INVDT, None]
    cx = ga[:, _A_C1X, None] + ga[:, _A_DCX, None] * lerp
    cy = ga[:, _A_C1X + 1, None] + ga[:, _A_DCX + 1, None] * lerp
    cz = ga[:, _A_C1X + 2, None] + ga[:, _A_DCX + 2, None] * lerp
    ocx, ocy, ocz = o[0] - cx, o[1] - cy, o[2] - cz
    a = (d * d).sum(axis=0)[None, :]
    b_half = d[0] * ocx + d[1] * ocy + d[2] * ocz
    r = ga[:, _A_RADIUS, None]
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b_half * b_half - a * c
    t = (-b_half - np.sqrt(np.maximum(disc, 0.0))) / a
    valid = (disc >= 0.0) & (t > MIN_T) & (r != 0.0)
    t = np.where(valid, t, np.float64(F32_MAX))
    return t.min(axis=0)                                   # [N]


def main():
    t0 = time.perf_counter()
    scene, snaps = snapshots_cached()
    print(f"# snapshots in {time.perf_counter() - t0:.0f}s", flush=True)
    gscene = build_grid_accel(scene)
    st_rows = gscene.tile_rows
    n_tiles = gscene.n_tiles
    brute_rows = scene.padded_size
    boxes = np.asarray(gscene.tile_boxes, np.float64)      # [T, 4]
    y_lo, y_hi = (float(x) for x in np.asarray(gscene.y_slab))
    print(f"# grid: {n_tiles} tiles x {st_rows} rows, globals "
          f"{gscene.glob_attrs.shape[0]}, brute rows {brute_rows}, "
          f"y slab [{y_lo:.2f}, {y_hi:.2f}]", flush=True)

    eps = 1e-12
    subs = (2, 4, 8, 16)  # sub-group gate granularity (tri_sub_gate twin)
    tw = {"sched": 0.0, "stat": 0.0, "prog": 0.0, "brute": 0.0,
          "glob": 0.0}
    tw.update({f"sub{q}": 0.0 for q in subs})
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if len(sel) < RB:
            continue
        o_a, d_a, tm_a = o[:, sel], d[:, sel], tm[:, sel]
        tg = glob_t(gscene, o_a.astype(np.float64), d_a.astype(np.float64),
                    tm_a)
        rec = hit_spheres(scene, jnp.asarray(o_a.T), jnp.asarray(d_a.T),
                          jnp.asarray(tm_a[0]))
        t_all = np.minimum(np.asarray(rec.t, np.float64), tg)

        n = o_a.shape[1]
        pad = (-n) % RB
        if pad:
            o_a = np.pad(o_a, ((0, 0), (0, pad)))
            o_a[1, n:] = -1e9
            d_a = np.pad(d_a, ((0, 0), (0, pad)))
            d_a[2, n:] = 1.0
            tg = np.pad(tg, (0, pad))
            t_all = np.pad(t_all, (0, pad))
        mask = np.asarray(footprint_block_mask_rows(
            gscene, jnp.asarray(o_a, jnp.float32),
            jnp.asarray(d_a, jnp.float32),
            jnp.asarray(tg[None], jnp.float32), MIN_T, RB))
        nb = mask.shape[0]
        sched = int(mask.sum())

        # Exact per-(lane, tile) touch: t interval inside the y slab,
        # then inside the tile's (x, z) box, non-empty within
        # [MIN_T, cap].
        stat_tot, prog_tot = 0, 0
        for b in range(nb):
            s = slice(b * RB, (b + 1) * RB)
            tiles = np.flatnonzero(mask[b])
            if not len(tiles):
                continue
            bx = boxes[tiles]                              # [V, 4]
            oc = o_a[:, s].astype(np.float64)
            dc = d_a[:, s].astype(np.float64)
            dn = np.where(np.abs(dc) < eps,
                          np.where(dc < 0, -eps, eps), dc)
            # y-slab interval (tile-independent)
            ty1 = (y_lo - oc[1]) / dn[1]
            ty2 = (y_hi - oc[1]) / dn[1]
            lo_y = np.minimum(ty1, ty2)
            hi_y = np.maximum(ty1, ty2)
            for cap, key in ((tg[s], "stat"), (t_all[s], "prog")):
                t_lo = np.maximum(MIN_T, lo_y)[None, :]
                t_hi = np.minimum(cap, hi_y)[None, :]
                for ax, cax in ((0, 0), (2, 2)):           # x, z
                    cidx = 0 if ax == 0 else 2
                    ta = (bx[:, cidx, None] - oc[ax]) / dn[ax]
                    tb = (bx[:, cidx + 1, None] - oc[ax]) / dn[ax]
                    t_lo = np.maximum(t_lo, np.minimum(ta, tb))
                    t_hi = np.minimum(t_hi, np.maximum(ta, tb))
                touch = t_lo <= t_hi                       # [V, RB]
                cnt = int(touch.any(axis=1).sum())
                if key == "stat":
                    stat_tot += cnt
                else:
                    prog_tot += cnt
                    v = touch.shape[0]
                    for q in subs:
                        # touched (tile, sub-group) pairs x rows x RB/q
                        # MACs each -> tile-row equivalents = sum / q
                        tq = touch.reshape(v, q, RB // q).any(axis=2)
                        tw[f"sub{q}"] += int(tq.sum()) * st_rows / q
        lanes = nb * RB
        tw["sched"] += sched * st_rows * lanes / nb / RB    # rows * blocks
        tw["stat"] += stat_tot * st_rows
        tw["prog"] += prog_tot * st_rows
        tw["brute"] += nb * brute_rows
        tw["glob"] += nb * gscene.glob_attrs.shape[0]
        print(f"depth {depth}: blocks {nb}, sched {sched/nb:6.1f}/"
              f"{n_tiles} tiles/blk -> static-touch {stat_tot/nb:6.1f}, "
              f"progressive {prog_tot/nb:6.1f}  | pair-rows/blk: brute "
              f"{brute_rows}, sched {sched/nb*st_rows:6.0f}, "
              f"stat {stat_tot/nb*st_rows:6.0f}+{gscene.glob_attrs.shape[0]}g,"
              f" prog {prog_tot/nb*st_rows:6.0f}+g", flush=True)

    b = tw["brute"]
    print(f"\n## block-weighted pair-rows vs brute {brute_rows}/lane:")
    for k in ("sched", "stat", "prog") + tuple(f"sub{q}" for q in subs):
        rows = tw[k] / max(tw['brute'] / brute_rows, 1)
        print(f"  {k:5s}: {rows:7.1f} rows/blk + {tw['glob']*brute_rows/b:.0f}"
              f" globals = {(tw[k]+tw['glob'])/b:.3f}x of brute")


if __name__ == "__main__":
    main()
