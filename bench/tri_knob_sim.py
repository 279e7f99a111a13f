#!/usr/bin/env python
"""Offline triangle-grid knob search (CPU, no chip time).

The tri-grid kernel's cost is ~proportional to per-block VISITED tiles x
tile_rows x ray_block (each visit is one [4*St,K]x[K,RB] MXU contraction
+ an RB-wide carry merge).  The visited count is a pure function of the
masks/schedules (tri_accel.tri_block_schedule_rows) and the per-lane
stopping bound — all backend-independent — so knob combos can be RANKED
here on real bounce-ray populations and only the winners A/B'd on the
chip (the policy_sim.py methodology, applied to the mesh20k config).

Method: march real rays (the mesh20k scene, config-4 camera) through the
exact jnp physics at a reduced resolution, snapshot (o, d, alive) per
bounce depth, bin-sort each snapshot exactly like the production
scheduler (persistent._bin_sort over the mesh AABB), then for each
(tile_rows, ray_block) combo compute, per block:

* scheduled tiles (the mask union — the no-early-exit cost), and
* visited tiles under the in-kernel front-to-back early exit: the first
  schedule index whose entry bound exceeds every lane's
  min(true best t, segment end) — the same stop rule the kernel runs.

Reported pair-work = sum_b visited_b * tile_rows * ray_block, in Mpairs,
plus a merge term ~ visited_b * ray_block.  Lower is better; ratios are
what matter (absolute time needs the chip).
"""

import os
import sys
import time

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
from win32_raytracer_tpu._cache import enable_compile_cache

enable_compile_cache()  # env var alone is read-too-late (runtime notes #21)

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.dispatch import get_hit_fn_rows_accel
from win32_raytracer_tpu.ops.hit import F32_MAX
from win32_raytracer_tpu.persistent import (
    PathState, _bin_sort, p_scatter_respawn_step,
)
from win32_raytracer_tpu.scene.builders import mesh_scene
from win32_raytracer_tpu.scene.camera import default_camera
from win32_raytracer_tpu.tri_accel import (
    build_tri_grid, hit_triangles_grid_jnp, tri_block_schedule_rows,
)

W, H = int(os.environ.get("TKS_W", 320)), int(os.environ.get("TKS_H", 240))  # config-4 shape; env overrides
DEPTHS = (0, 1, 2, 4, 7)  # snapshot bounce depths
TILE_ROWS = (32, 64, 128)
RAY_BLOCKS = (512, 1024, 2048)
MERGE_COST = 24.0         # VPU slots/lane of the carry merge, vs ~14
#                           slots/pair in the MXU sweep epilogue — turns
#                           the per-tile fixed term into pair-equivalents


def collect_snapshots():
    """March one sample per pixel through the exact jnp physics on the
    composite mesh20k scene; return [(depth, o, d, tm, alive_frac)]."""
    cfg = RenderConfig(width=W, height=H, samples=1, seed=3, backend="jnp")
    scene = mesh_scene(subdivisions=5)
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
    # First respawn starts sample 0 on every lane (scatter is a no-op on
    # dead lanes), then each loop iteration = one production bounce.
    from win32_raytracer_tpu.persistent import p_respawn_step
    st = p_respawn_step(cam, st, jnp.uint32(7), jnp.int32(0), cfg=cfg,
                        width=W, height=H, spp=1)
    from win32_raytracer_tpu.persistent import p_hit_step
    snaps = []
    for depth in range(max(DEPTHS) + 1):
        if depth in DEPTHS:
            alive = np.asarray(st.path_alive[0])
            snaps.append((depth, np.asarray(st.origin),
                          np.asarray(st.direction), np.asarray(st.time),
                          alive))
            print(f"# depth {depth}: alive {alive.mean():.3f}",
                  flush=True)
        rec, st = p_hit_step(rscene, st, cfg=cfg, hit_fn=hit_fn)
        st = p_scatter_respawn_step(
            rscene, cam, st, rec, jnp.uint32(7), jnp.int32(depth + 1),
            cfg=cfg, width=W, height=H, spp=1)
    return scene, snaps


def eval_combo(grid, o, d, tm, best_bound, rb):
    """(scheduled, visited) tile totals over blocks of rb lanes."""
    n = o.shape[1]
    pad = (-n) % rb
    if pad:
        o = np.pad(o, ((0, 0), (0, pad)))
        o[1, n:] = -1e9
        d = np.pad(d, ((0, 0), (0, pad)))
        d[2, n:] = 1.0
        best_bound = np.pad(best_bound, (0, pad))
    mask, tlo, cap_eff = (np.asarray(x) for x in tri_block_schedule_rows(
        grid, jnp.asarray(o), jnp.asarray(d), None, 0.001, rb))
    nb = mask.shape[0]
    # The kernel's stop bound: every lane's min(best t, segment end).
    bound = np.minimum(best_bound, cap_eff[0]).reshape(nb, rb).max(axis=1)
    key = np.where(mask > 0, np.minimum(tlo, 1e6), 1.5e6)
    order = np.argsort(key, axis=1, kind="stable")
    tlo_sorted = np.take_along_axis(key, order, axis=1)
    counts = (mask > 0).sum(axis=1)
    # visited = first schedule index whose NEXT entry bound > block bound
    # (the kernel checks after each sweep), capped at the active count.
    nxt = np.concatenate([tlo_sorted[:, 1:],
                          np.full((nb, 1), 1.5e6, np.float32)], axis=1)
    stop_ok = nxt > bound[:, None]
    # first True position per row (always True at the padded end)
    first_stop = stop_ok.argmax(axis=1) + 1
    visited = np.minimum(first_stop, counts)
    visited = np.where(counts == 0, 0, visited)
    return int(counts.sum()), int(visited.sum()), nb


def collect_snapshots_cached():
    """Snapshot collection is the expensive part (~13 min at 640x480 on
    this 1-core host); cache to /tmp keyed by resolution."""
    path = f"/tmp/tks_snaps_{W}x{H}.npz"
    scene = mesh_scene(subdivisions=5)
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


_ORACLE_CACHE: dict = {}


def oracle_ts(scene, depth, o_a, d_a, tm_a):
    """(t_sph, best_a) for one snapshot's alive lanes — the slow jnp
    sphere + grid sweeps, disk-cached per (resolution, depth, snapshot
    content) since every sweep mode needs the same occlusion oracle.
    The content fingerprint keeps a regenerated snapshot set (new scene
    builder, new seed) from silently reusing a stale oracle whose lane
    arrays no longer correspond."""
    import hashlib
    fp = hashlib.sha1()
    fp.update(np.ascontiguousarray(o_a).tobytes())
    fp.update(np.ascontiguousarray(d_a).tobytes())
    fp = fp.hexdigest()[:12]
    key = (W, H, depth, fp)
    if key in _ORACLE_CACHE:
        return _ORACLE_CACHE[key]
    path = f"/tmp/tks_oracle_{W}x{H}_d{depth}_{fp}.npz"
    if os.path.exists(path):
        with np.load(path) as z:
            out = (z["t_sph"], z["best_a"])
        _ORACLE_CACHE[key] = out
        return out
    from win32_raytracer_tpu.ops.hit import hit_spheres
    grid = build_tri_grid(scene.triangles, tile_rows=64)
    rec_s = hit_spheres(scene.spheres, jnp.asarray(o_a.T),
                        jnp.asarray(d_a.T), jnp.asarray(tm_a[0]))
    t_sph = np.asarray(rec_s.t)
    t_tri, _ = hit_triangles_grid_jnp(
        grid, jnp.asarray(o_a), jnp.asarray(d_a), jnp.asarray(tm_a),
        t_cap=jnp.asarray(t_sph[None]))
    best_a = np.minimum(np.asarray(t_tri)[0], t_sph)
    np.savez(path, t_sph=t_sph, best_a=best_a)
    out = (t_sph, best_a)
    _ORACLE_CACHE[key] = out
    return out


def _sort_keys(o, d, lo3, inv_ext, hi_t, variant):
    """Alternative lane-sort keys (numpy; evaluated offline before any
    change to persistent._bin_sort).  Returns [N] integer keys."""
    def cells(p, bits):
        n_c = 1 << bits
        c = np.clip(((p - lo3[:, None]) * inv_ext[:, None] * n_c
                     ).astype(np.int64), 0, n_c - 1)
        return c

    def morton(c, bits):
        out = np.zeros(c.shape[1], np.int64)
        for b in range(bits):
            for ax in range(3):
                out |= ((c[ax] >> b) & 1) << (3 * b + ax)
        return out

    octant = ((d[0] < 0).astype(np.int64)
              | ((d[1] < 0).astype(np.int64) << 1)
              | ((d[2] < 0).astype(np.int64) << 2))
    if variant == "pos8+oct":                 # production key
        return (morton(cells(o, 3), 3) << 3) | octant
    if variant == "pos16+oct":
        return (morton(cells(o, 4), 4) << 3) | octant
    if variant == "pos4+oct":
        return (morton(cells(o, 2), 2) << 3) | octant
    if variant == "oct+pos8":                 # direction-major
        return (octant << 9) | morton(cells(o, 3), 3)
    if variant == "pos8+exit4":               # chord-aware: exit cell
        ex = o + hi_t[None, :] * d
        return ((morton(cells(o, 3), 3) << 6)
                | morton(cells(ex, 2), 2))
    if variant == "pos4+exit4+oct":
        ex = o + hi_t[None, :] * d
        return ((morton(cells(o, 2), 2) << 9)
                | (morton(cells(ex, 2), 2) << 3) | octant)
    raise ValueError(variant)


def key_variant_sweep(scene, snaps, grids, st_rows=32, rb=512):
    """Rank lane-sort keys by pair work at the fixed winner combo."""
    from win32_raytracer_tpu.ops.hit import hit_spheres
    grid = grids[st_rows]
    sb = np.asarray(grid.scene_box, np.float64)
    lo3 = sb[0::2].astype(np.float32)
    inv_ext = (1.0 / np.maximum(sb[1::2] - sb[0::2], 1e-6)).astype(
        np.float32)
    variants = ["pos8+oct", "pos16+oct", "pos4+oct", "oct+pos8",
                "pos8+exit4", "pos4+exit4+oct"]
    totals = {v: 0.0 for v in variants}
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if len(sel) < rb:
            continue
        o_a, d_a, tm_a = o[:, sel], d[:, sel], tm[:, sel]
        rec_s = hit_spheres(scene.spheres, jnp.asarray(o_a.T),
                            jnp.asarray(d_a.T), jnp.asarray(tm_a[0]))
        t_sph = np.asarray(rec_s.t)
        t_tri, _ = hit_triangles_grid_jnp(
            grid, jnp.asarray(o_a), jnp.asarray(d_a), jnp.asarray(tm_a),
            t_cap=jnp.asarray(t_sph[None]))
        best_a = np.minimum(np.asarray(t_tri)[0], t_sph)
        # segment end for the exit-cell keys (scene-box slab test)
        eps = 1e-12
        lo_t = np.full(o_a.shape[1], 0.001, np.float32)
        hi_t = np.full(o_a.shape[1], 1e8, np.float32)
        for ax in range(3):
            dn = np.where(np.abs(d_a[ax]) < eps,
                          np.where(d_a[ax] < 0, -eps, eps), d_a[ax])
            ta = (sb[2 * ax] - o_a[ax]) / dn
            tb = (sb[2 * ax + 1] - o_a[ax]) / dn
            lo_t = np.maximum(lo_t, np.minimum(ta, tb).astype(np.float32))
            hi_t = np.minimum(hi_t, np.maximum(ta, tb).astype(np.float32))
        hi_t = np.maximum(hi_t, 0.0)
        print(f"\n## key sweep, depth {depth} ({len(sel)} lanes, "
              f"St={st_rows} RB={rb})")
        base = None
        for v in variants:
            keys = _sort_keys(o_a, d_a, lo3, inv_ext, hi_t, v)
            order = np.argsort(keys, kind="stable")
            sched, vis, nb = eval_combo(
                grid, o_a[:, order], d_a[:, order], tm_a[:, order],
                best_a[order], rb)
            pw = vis * st_rows * rb / 1e6
            cost = pw + vis * rb * MERGE_COST / 14.0 / 1e6
            if base is None:
                base = cost
            totals[v] += cost * len(sel)
            print(f"{v:>16s}: visit {vis:6d} tiles/blk {vis / nb:6.1f} "
                  f"pairs {pw:7.1f}M ({cost / base:5.2f}x)", flush=True)
    print("\n## key-variant lane-weighted totals")
    base = min(totals.values())
    for v, c in sorted(totals.items(), key=lambda kv: kv[1]):
        print(f"{v:>16s}: {c / base:5.2f}x")


def partition_sweep(scene, snaps, rb=512):
    """Rank tile partitions (morton vs median split) by pair work, lanes
    sorted by the PRODUCTION chord key, at both tile granularities."""
    from win32_raytracer_tpu.ops.hit import hit_spheres
    combos = [("morton", 32), ("median", 32), ("morton", 64),
              ("median", 64)]
    grids = {(p, st): build_tri_grid(scene.triangles, tile_rows=st,
                                     partition=p) for p, st in combos}
    for (p, st), g in grids.items():
        diag = np.linalg.norm(np.asarray(g.tile_boxes)[:, 1::2]
                              - np.asarray(g.tile_boxes)[:, 0::2], axis=1)
        print(f"# grid {p}/{st}: {g.n_tiles} tiles, "
              f"mean diag {diag.mean():.3f}", flush=True)
    sb = np.asarray(grids[("morton", 32)].scene_box, np.float64)
    lo3 = sb[0::2].astype(np.float32)
    inv_ext = (1.0 / np.maximum(sb[1::2] - sb[0::2], 1e-6)).astype(
        np.float32)
    totals = {c: 0.0 for c in combos}
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if len(sel) < rb:
            continue
        o_a, d_a, tm_a = o[:, sel], d[:, sel], tm[:, sel]
        rec_s = hit_spheres(scene.spheres, jnp.asarray(o_a.T),
                            jnp.asarray(d_a.T), jnp.asarray(tm_a[0]))
        t_sph = np.asarray(rec_s.t)
        t_tri, _ = hit_triangles_grid_jnp(
            grids[("morton", 32)], jnp.asarray(o_a), jnp.asarray(d_a),
            jnp.asarray(tm_a), t_cap=jnp.asarray(t_sph[None]))
        best_a = np.minimum(np.asarray(t_tri)[0], t_sph)
        eps = 1e-12
        hi_t = np.full(o_a.shape[1], 1e8, np.float32)
        for ax in range(3):
            dn = np.where(np.abs(d_a[ax]) < eps,
                          np.where(d_a[ax] < 0, -eps, eps), d_a[ax])
            ta = (sb[2 * ax] - o_a[ax]) / dn
            tb = (sb[2 * ax + 1] - o_a[ax]) / dn
            hi_t = np.minimum(hi_t, np.maximum(ta, tb).astype(np.float32))
        hi_t = np.maximum(hi_t, 0.0)
        keys = _sort_keys(o_a, d_a, lo3, inv_ext, hi_t, "pos4+exit4+oct")
        order = np.argsort(keys, kind="stable")
        print(f"\n## partition sweep, depth {depth} ({len(sel)} lanes, "
              f"RB={rb})")
        base = None
        for c in combos:
            p, st = c
            sched, vis, nb = eval_combo(
                grids[c], o_a[:, order], d_a[:, order], tm_a[:, order],
                best_a[order], rb)
            pw = vis * st * rb / 1e6
            cost = pw + vis * rb * MERGE_COST / 14.0 / 1e6
            if base is None:
                base = cost
            totals[c] += cost * len(sel)
            print(f"{p:>7s}/{st:<3d}: visit {vis:6d} tiles/blk "
                  f"{vis / nb:6.1f} pairs {pw:7.1f}M "
                  f"({cost / base:5.2f}x)", flush=True)
    print("\n## partition lane-weighted totals")
    base = min(totals.values())
    for c, v in sorted(totals.items(), key=lambda kv: kv[1]):
        print(f"{c[0]:>7s}/{c[1]:<3d}: {v / base:5.2f}x")


def capped_key_sweep(scene, snaps, st_rows=32, rb=512):
    """Predict the two-phase hit restructure: sphere pass FIRST, then
    sort the triangle working set by an occlusion-CAPPED chord key
    (no-touch lanes packed last, where their blocks schedule ~zero
    tiles).  Compares the production key (uncapped, sorted before the
    sphere pass) against capped variants at the same combo."""
    from win32_raytracer_tpu.ops.hit import hit_spheres
    grid = build_tri_grid(scene.triangles, tile_rows=st_rows)
    sb = np.asarray(grid.scene_box, np.float64)
    lo3 = sb[0::2].astype(np.float32)
    inv_ext = (1.0 / np.maximum(sb[1::2] - sb[0::2], 1e-6)).astype(
        np.float32)
    totals = {}
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if len(sel) < rb:
            continue
        o_a, d_a, tm_a = o[:, sel], d[:, sel], tm[:, sel]
        t_sph, best_a = oracle_ts(scene, depth, o_a, d_a, tm_a)
        # box slab: entry/exit of the UNCAPPED segment
        eps = 1e-12
        lo_t = np.full(o_a.shape[1], 0.001, np.float32)
        hi_t = np.full(o_a.shape[1], 1e8, np.float32)
        for ax in range(3):
            dn = np.where(np.abs(d_a[ax]) < eps,
                          np.where(d_a[ax] < 0, -eps, eps), d_a[ax])
            ta = ((sb[2 * ax] - o_a[ax]) / dn).astype(np.float32)
            tb = ((sb[2 * ax + 1] - o_a[ax]) / dn).astype(np.float32)
            lo_t = np.maximum(lo_t, np.minimum(ta, tb))
            hi_t = np.minimum(hi_t, np.maximum(ta, tb))
        hi_t = np.maximum(hi_t, 0.0)
        # the sphere pass's t caps the segment (the real restructure
        # would use rec_sphere.t; the sim uses t_sph likewise)
        hi_c = np.minimum(hi_t, t_sph.astype(np.float32))
        no_touch = (hi_c < lo_t)
        print(f"\n## capped-key sweep, depth {depth} "
              f"({len(sel)} lanes, {no_touch.mean()*100:.0f}% no-touch, "
              f"St={st_rows} RB={rb})")
        base = None
        arms = ["production", "capped", "capped+entry"]
        for vname in arms:
            if vname == "production":
                keys = _sort_keys(o_a, d_a, lo3, inv_ext, hi_t,
                                  "pos4+exit4+oct").astype(np.int64)
            else:
                # entry point = o + lo_t*d (clamped into the box), exit
                # from the CAPPED segment end; no-touch lanes last.
                ent = np.stack([o_a[ax] + lo_t * d_a[ax]
                                for ax in range(3)])
                ex = np.stack([o_a[ax] + hi_c * d_a[ax]
                               for ax in range(3)])
                def mcells(p, bits):
                    n_c = 1 << bits
                    c = np.clip(((p - lo3[:, None]) * inv_ext[:, None]
                                 * n_c).astype(np.int64), 0, n_c - 1)
                    out = np.zeros(p.shape[1], np.int64)
                    for b in range(bits):
                        for ax in range(3):
                            out |= ((c[ax] >> b) & 1) << (3 * b + ax)
                    return out
                octant = ((d_a[0] < 0).astype(np.int64)
                          | ((d_a[1] < 0).astype(np.int64) << 1)
                          | ((d_a[2] < 0).astype(np.int64) << 2))
                if vname == "capped":
                    keys = ((mcells(o_a, 2) << 9)
                            | (mcells(ex, 2) << 3) | octant)
                else:  # capped+entry: key on the box ENTRY cell instead
                    keys = ((mcells(ent, 2) << 9)
                            | (mcells(ex, 2) << 3) | octant)
                keys = np.where(no_touch, np.int64(1 << 40), keys)
            order = np.argsort(keys, kind="stable")
            _, vis, nb = eval_combo(
                grid, o_a[:, order], d_a[:, order], tm_a[:, order],
                best_a[order], rb)
            pw = vis * st_rows * rb / 1e6
            cost = pw + vis * rb * MERGE_COST / 14.0 / 1e6
            if base is None:
                base = cost
            totals[vname] = totals.get(vname, 0.0) + cost * len(sel)
            print(f"{vname:>14s}: visit {vis:6d} tiles/blk "
                  f"{vis / nb:6.1f} pairs {pw:7.1f}M "
                  f"({cost / base:5.2f}x)", flush=True)
    print("\n## capped-key lane-weighted totals")
    base = max(totals.values())
    for v, c in sorted(totals.items(), key=lambda kv: kv[1]):
        print(f"{v:>14s}: {c / base:5.2f}x")


def dda_expansion_sweep(scene, snaps, st_rows=32, rb=512, grid_n=4,
                        k_max=8):
    """Size the per-tile gather restructure: each lane EXPANDS into the
    macro-cells (grid_n^3 over the scene box) its capped chord visits
    (DDA, up to k_max), pairs sort by cell, and ray blocks are cut from
    the pair list — every block then covers ~one cell, so its schedule
    is that cell's static tile list instead of a degenerate union.
    Models pair work + duplicate-merge cost; compares against the
    capped-key block scheme at the same combo."""
    from win32_raytracer_tpu.ops.hit import hit_spheres
    grid = build_tri_grid(scene.triangles, tile_rows=st_rows)
    boxes = np.asarray(grid.tile_boxes, np.float64)       # [T, 6]
    sb = np.asarray(grid.scene_box, np.float64)
    lo3 = sb[0::2]
    ext = np.maximum(sb[1::2] - sb[0::2], 1e-9)
    csz = ext / grid_n
    # static cell -> tile-list: tile AABB vs cell AABB overlap
    n_cells = grid_n ** 3
    cell_tiles = np.zeros((n_cells, len(boxes)), bool)
    for ci in range(n_cells):
        cx, cy, cz = (ci % grid_n, (ci // grid_n) % grid_n,
                      ci // (grid_n * grid_n))
        clo = lo3 + np.array([cx, cy, cz]) * csz
        chi = clo + csz
        ov = np.ones(len(boxes), bool)
        for ax in range(3):
            ov &= (boxes[:, 2 * ax] <= chi[ax]) & (
                boxes[:, 2 * ax + 1] >= clo[ax])
        cell_tiles[ci] = ov
    print(f"# macro {grid_n}^3: tiles/cell mean "
          f"{cell_tiles.sum(1).mean():.1f} max {cell_tiles.sum(1).max()}",
          flush=True)

    tot_dda, tot_block, tot_pairs_per_lane = 0.0, 0.0, []
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if len(sel) < rb:
            continue
        o_a, d_a, tm_a = o[:, sel], d[:, sel], tm[:, sel]
        t_sph, best_a = oracle_ts(scene, depth, o_a, d_a, tm_a)
        n = o_a.shape[1]
        eps = 1e-12
        lo_t = np.full(n, 0.001)
        hi_t = np.full(n, 1e8)
        dn = np.where(np.abs(d_a) < eps,
                      np.where(d_a < 0, -eps, eps), d_a).astype(np.float64)
        for ax in range(3):
            ta = (sb[2 * ax] - o_a[ax]) / dn[ax]
            tb = (sb[2 * ax + 1] - o_a[ax]) / dn[ax]
            lo_t = np.maximum(lo_t, np.minimum(ta, tb))
            hi_t = np.minimum(hi_t, np.maximum(ta, tb))
        hi_c = np.minimum(hi_t, t_sph)  # occlusion cap (sphere pass)
        touch = hi_c >= lo_t

        # DDA: fixed k_max steps from the entry point; cell per step.
        # Lanes still inside the capped chord after k_max steps are
        # OVERFLOW lanes: the kernel (tri_dda.dda_pairs) collapses them
        # to one full-segment pair (exactness), so model them as a
        # single pair whose block contribution is the union of ALL
        # cells their chord touches — not a silent truncation.
        cells_visited = np.full((k_max, n), -1, np.int64)
        t_cur = np.where(touch, lo_t, np.inf)
        overflow_cells = [set() for _ in range(n)]
        k = 0
        while True:
            live = t_cur <= hi_c
            if not live.any():
                break
            p = o_a.astype(np.float64) + t_cur * d_a.astype(np.float64)
            ci = np.zeros(n, np.int64)
            for ax in range(3):
                c = np.clip(((p[ax] - lo3[ax]) / csz[ax]).astype(
                    np.int64), 0, grid_n - 1)
                ci += c * (grid_n ** ax)
            if k < k_max:
                cells_visited[k] = np.where(live, ci, -1)
            else:
                for li in np.flatnonzero(live):
                    overflow_cells[li].add(int(ci[li]))
                if k > 3 * grid_n + k_max:
                    break  # a chord crosses <= 3*G+1 cells
            # advance to the next cell boundary along the ray
            t_next = np.full(n, np.inf)
            for ax in range(3):
                c = np.clip(((p[ax] - lo3[ax]) / csz[ax]).astype(
                    np.int64), 0, grid_n - 1)
                step_to = lo3[ax] + np.where(dn[ax] > 0, c + 1, c) * csz[ax]
                t_ax = (step_to - o_a[ax]) / dn[ax]
                t_next = np.minimum(t_next, np.where(
                    t_ax > t_cur + 1e-9, t_ax, np.inf))
            t_cur = t_next
            k += 1
        over = np.array([len(s) > 0 for s in overflow_cells])
        n_over = int(over.sum())
        # dedupe repeated cells per lane (clamping at box edges);
        # overflow lanes contribute ONE full-segment pair instead
        pair_cell, pair_lane = [], []
        for k in range(k_max):
            ci = cells_visited[k]
            new = (ci >= 0) & ~over
            for j in range(k):
                new &= ci != cells_visited[j]
            idx = np.flatnonzero(new)
            pair_cell.append(ci[idx])
            pair_lane.append(idx)
        # Full-segment pairs carry their lane's FIRST cell as sort key —
        # that is what the kernel does (tri_dda.dda_pairs slot 0 keeps
        # keys[0] for overflow lanes) — so they mix into that cell's
        # regular blocks and their whole-chord union pollutes it.  (An
        # earlier sentinel-keyed model concentrated them in trailing
        # blocks and under-modeled pollution in overflow-heavy regimes.)
        over_idx = np.flatnonzero(over)
        over_sets = [np.fromiter(overflow_cells[li], np.int64)
                     for li in over_idx]
        # overflow lanes also visited their first k_max cells
        for j, li in enumerate(over_idx):
            head = cells_visited[:, li]
            over_sets[j] = np.unique(np.concatenate(
                [over_sets[j], head[head >= 0]]))
        over_first = cells_visited[0, over_idx]
        pc = np.concatenate(pair_cell + [over_first])
        pl = np.concatenate(pair_lane + [over_idx])
        pf = np.concatenate([np.zeros(len(x), bool) for x in pair_cell]
                            + [np.ones(n_over, bool)])
        tot_pairs_per_lane.append(len(pc) / n)
        order = np.argsort(pc, kind="stable")
        pc, pl, pf = pc[order], pl[order], pf[order]
        n_pairs = len(pc)
        over_rank = {int(li): j for j, li in enumerate(over_idx)}
        # blocks of rb pairs; block cost = union of distinct cells'
        # tiles; full-segment pairs union their whole chord
        dda_vis = 0
        for b0 in range(0, n_pairs, rb):
            bc, bl, bf = pc[b0:b0 + rb], pl[b0:b0 + rb], pf[b0:b0 + rb]
            cs = np.unique(bc[~bf])
            mask = cell_tiles[cs].any(axis=0)
            for li in bl[bf]:
                mask = mask | cell_tiles[
                    over_sets[over_rank[int(li)]]].any(axis=0)
            dda_vis += int(mask.sum())
        dda_pairs = dda_vis * st_rows * rb
        dda_cost = (dda_pairs + dda_vis * rb * MERGE_COST / 14.0
                    + n_pairs * MERGE_COST)  # + per-duplicate lane merge

        # capped-key block arm at same combo (reuses eval_combo)
        lo_c = np.maximum(lo_t, 0.0)
        ent = np.stack([o_a[ax] + lo_c * d_a[ax] for ax in range(3)])
        ex = np.stack([o_a[ax] + np.maximum(np.minimum(hi_c, 1e8), 0.0)
                       * d_a[ax] for ax in range(3)])
        inv_ext = (1.0 / ext).astype(np.float32)
        def mcells(p, bits):
            n_c = 1 << bits
            c = np.clip(((p - lo3[:, None]) * inv_ext[:, None] * n_c
                         ).astype(np.int64), 0, n_c - 1)
            out = np.zeros(p.shape[1], np.int64)
            for b in range(bits):
                for ax in range(3):
                    out |= ((c[ax] >> b) & 1) << (3 * b + ax)
            return out
        octant = ((d_a[0] < 0).astype(np.int64)
                  | ((d_a[1] < 0).astype(np.int64) << 1)
                  | ((d_a[2] < 0).astype(np.int64) << 2))
        keys = (mcells(ent, 2) << 9) | (mcells(ex, 2) << 3) | octant
        keys = np.where(touch, keys, np.int64(1 << 40))
        order = np.argsort(keys, kind="stable")
        _, vis, nb = eval_combo(
            grid, o_a[:, order], d_a[:, order], tm_a[:, order],
            best_a[order], rb)
        blk_pairs = vis * st_rows * rb
        blk_cost = blk_pairs + vis * rb * MERGE_COST / 14.0
        tot_dda += dda_cost * n
        tot_block += blk_cost * n
        print(f"depth {depth}: capped-block {blk_cost/1e6:8.1f}M, "
              f"dda {dda_cost/1e6:8.1f}M ({blk_cost/max(dda_cost,1):.2f}x"
              f"; {len(pc)/n:.2f} cells/lane, "
              f"{100.0 * n_over / n:.1f}% overflow)", flush=True)
    print(f"\n## dda expansion: capped-block/dda = "
          f"{tot_block/max(tot_dda,1):.2f}x lane-weighted "
          f"(G={grid_n}, K={k_max}, St={st_rows}, RB={rb})")


def ideal_sweep(scene, snaps, st_rows=32, rb=512):
    """Size the per-tile ray RE-BINNING prize: exact per-ray tile-touch
    pair work (every ray pays only tiles its own clipped segment
    reaches) vs the shipped per-block union schedule.  The gap is the
    theoretical ceiling of re-binning rays to tiles (gather/pack costs
    not modeled)."""
    from win32_raytracer_tpu.ops.hit import hit_spheres
    grid = build_tri_grid(scene.triangles, tile_rows=st_rows)
    boxes = np.asarray(grid.tile_boxes, np.float64)       # [T, 6]
    sb = np.asarray(grid.scene_box, np.float64)
    lo3 = sb[0::2].astype(np.float32)
    inv_ext = (1.0 / np.maximum(sb[1::2] - sb[0::2], 1e-6)).astype(
        np.float32)
    tot_block, tot_ideal = 0.0, 0.0
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if len(sel) < rb:
            continue
        o_a, d_a, tm_a = o[:, sel], d[:, sel], tm[:, sel]
        rec_s = hit_spheres(scene.spheres, jnp.asarray(o_a.T),
                            jnp.asarray(d_a.T), jnp.asarray(tm_a[0]))
        t_sph = np.asarray(rec_s.t)
        t_tri, _ = hit_triangles_grid_jnp(
            grid, jnp.asarray(o_a), jnp.asarray(d_a), jnp.asarray(tm_a),
            t_cap=jnp.asarray(t_sph[None]))
        best_a = np.minimum(np.asarray(t_tri)[0], t_sph)
        # production lane order for the block arm
        eps = 1e-12
        hi_t = np.full(o_a.shape[1], 1e8, np.float32)
        for ax in range(3):
            dn = np.where(np.abs(d_a[ax]) < eps,
                          np.where(d_a[ax] < 0, -eps, eps), d_a[ax])
            ta = (sb[2 * ax] - o_a[ax]) / dn
            tb = (sb[2 * ax + 1] - o_a[ax]) / dn
            hi_t = np.minimum(hi_t, np.maximum(ta, tb).astype(np.float32))
        hi_t = np.maximum(hi_t, 0.0)
        keys = _sort_keys(o_a, d_a, lo3, inv_ext, hi_t, "pos4+exit4+oct")
        order = np.argsort(keys, kind="stable")
        _, vis, nb = eval_combo(
            grid, o_a[:, order], d_a[:, order], tm_a[:, order],
            best_a[order], rb)
        block_pairs = vis * st_rows * rb

        # Exact per-ray tile touches: slab test each ray segment
        # [0.001, min(best, scene exit)] against every tile AABB.
        n = o_a.shape[1]
        cap = np.minimum(best_a, hi_t.astype(np.float64))
        touched = 0
        for c0 in range(0, n, 32768):
            c1 = min(n, c0 + 32768)
            oc = o_a[:, c0:c1].astype(np.float64)          # [3, C]
            dc = d_a[:, c0:c1].astype(np.float64)
            dn = np.where(np.abs(dc) < eps,
                          np.where(dc < 0, -eps, eps), dc)
            lo_seg = np.full(c1 - c0, 0.001)
            hi_seg = cap[c0:c1]
            t_lo = np.full((len(boxes), c1 - c0), 0.001)
            t_hi = np.tile(hi_seg, (len(boxes), 1))
            for ax in range(3):
                ta = (boxes[:, 2 * ax, None] - oc[ax]) / dn[ax]
                tb = (boxes[:, 2 * ax + 1, None] - oc[ax]) / dn[ax]
                t_lo = np.maximum(t_lo, np.minimum(ta, tb))
                t_hi = np.minimum(t_hi, np.maximum(ta, tb))
            touched += int((t_lo <= t_hi).sum())
        ideal_pairs = touched * st_rows
        tot_block += block_pairs * 1.0
        tot_ideal += ideal_pairs * 1.0
        print(f"depth {depth}: block {block_pairs/1e6:8.1f}M pairs, "
              f"per-ray ideal {ideal_pairs/1e6:8.1f}M "
              f"({block_pairs/max(ideal_pairs,1):.2f}x headroom; "
              f"{touched/n:.1f} tiles/ray)", flush=True)
    print(f"\n## re-binning ceiling: block/ideal = "
          f"{tot_block/max(tot_ideal,1):.2f}x at St={st_rows} RB={rb}")


def anyskip_sweep(scene, snaps, st_rows=64, rb=2048, subs=(2, 4, 8, 16)):
    """Price the IN-KERNEL exact any-touch skip at production knobs.

    The shipped schedule is doubly conservative (per-ray segment box ->
    block union box -> tile AABB overlap, tri_accel.py:284-348).  The
    candidate kernel change keeps the schedule and block count UNCHANGED
    (so this sim may rank it — the job-540 hazard only bites knobs that
    multiply block count) and, per visited tile, slab-tests every lane's
    capped segment against the tile box on the VPU (~25 slots/lane vs
    the 4*St*K-MAC contraction) and pl.when-skips the contraction+merge
    when NO lane touches.  Two variants:

    * static   — per-lane cap = cap_eff (scene exit ∧ sphere t_cap),
                 exactly what rays7 row 6 holds: a safe lower bound on
                 the win.
    * progressive — cap further tightened by the lane's FINAL best t,
                 modeling `min(cap, t_ref)` inside the sweep (optimistic:
                 t_ref at visit time is >= the final best).

    ``subs``: also price SUB-BLOCK gating — the gate applied per
    RB/q-lane sub-group (contraction sliced to the sub-group's columns).
    Lanes are chord-key sorted, so sub-groups are spatially coherent and
    a tile touched by one corner of the block skips the other quarters'
    MACs.  Block count (and the schedule) stay UNCHANGED, so this sim
    may rank it; what it cannot price is the extra pl.when branch per
    (tile, sub-group) — the chip decides that term."""
    grid = build_tri_grid(scene.triangles, tile_rows=st_rows)
    boxes = np.asarray(grid.tile_boxes, np.float64)        # [T, 6]
    sb = np.asarray(grid.scene_box, np.float64)
    lo3 = sb[0::2].astype(np.float32)
    inv_ext = (1.0 / np.maximum(sb[1::2] - sb[0::2], 1e-6)).astype(
        np.float32)
    eps = 1e-12
    tot_vis, tot_stat, tot_prog = 0.0, 0.0, 0.0
    tot_sub = {q: 0.0 for q in subs}   # MAC-equivalents at sub-gate q
    tot_subp = {q: 0.0 for q in subs}  # gate-predicate count (branches)
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if len(sel) < rb:
            continue
        o_a, d_a, tm_a = o[:, sel], d[:, sel], tm[:, sel]
        t_sph, best_a = oracle_ts(scene, depth, o_a, d_a, tm_a)
        # production lane order: the pre-hit chord key (no occlusion cap
        # — prod bin-sorts BEFORE the sphere pass)
        hi_t = np.full(o_a.shape[1], 1e8, np.float32)
        for ax in range(3):
            dn = np.where(np.abs(d_a[ax]) < eps,
                          np.where(d_a[ax] < 0, -eps, eps), d_a[ax])
            ta = (sb[2 * ax] - o_a[ax]) / dn
            tb = (sb[2 * ax + 1] - o_a[ax]) / dn
            hi_t = np.minimum(hi_t, np.maximum(ta, tb).astype(np.float32))
        hi_t = np.maximum(hi_t, 0.0)
        keys = _sort_keys(o_a, d_a, lo3, inv_ext, hi_t, "pos4+exit4+oct")
        order_l = np.argsort(keys, kind="stable")
        o_a, d_a, tm_a = o_a[:, order_l], d_a[:, order_l], tm_a[:, order_l]
        t_sph, best_a = t_sph[order_l], best_a[order_l]

        n = o_a.shape[1]
        pad = (-n) % rb
        if pad:
            o_a = np.pad(o_a, ((0, 0), (0, pad)))
            o_a[1, n:] = -1e9
            d_a = np.pad(d_a, ((0, 0), (0, pad)))
            d_a[2, n:] = 1.0
            t_sph = np.pad(t_sph, (0, pad))
            best_a = np.pad(best_a, (0, pad))
        mask, tlo, cap_eff = (np.asarray(x) for x in tri_block_schedule_rows(
            grid, jnp.asarray(o_a), jnp.asarray(d_a),
            jnp.asarray(t_sph[None]), 0.001, rb))
        nb = mask.shape[0]
        key = np.where(mask > 0, np.minimum(tlo, 1e6), 1.5e6)
        order = np.argsort(key, axis=1, kind="stable")
        tlo_sorted = np.take_along_axis(key, order, axis=1)
        counts = (mask > 0).sum(axis=1)
        bound = np.minimum(best_a, cap_eff[0]).reshape(nb, rb).max(axis=1)
        nxt = np.concatenate([tlo_sorted[:, 1:],
                              np.full((nb, 1), 1.5e6, np.float32)], axis=1)
        first_stop = (nxt > bound[:, None]).argmax(axis=1) + 1
        visited = np.where(counts == 0, 0,
                           np.minimum(first_stop, counts))

        cap_s = cap_eff[0]
        cap_p = np.minimum(cap_s, best_a)
        vis_tot, stat_tot, prog_tot = 0, 0, 0
        sub_tot = {q: 0 for q in subs}   # touched (tile, sub-group) pairs
        subp_tot = {q: 0 for q in subs}  # predicates evaluated
        for b in range(nb):
            v = int(visited[b])
            if v == 0:
                continue
            tiles = order[b, :v]
            bx = boxes[tiles]                              # [V, 6]
            s = slice(b * rb, (b + 1) * rb)
            oc = o_a[:, s].astype(np.float64)
            dc = d_a[:, s].astype(np.float64)
            dn = np.where(np.abs(dc) < eps,
                          np.where(dc < 0, -eps, eps), dc)
            t_lo = np.full((v, rb), 0.001)
            hi_st = np.tile(cap_s[s], (v, 1))
            hi_pr = np.tile(cap_p[s], (v, 1))
            for ax in range(3):
                ta = (bx[:, 2 * ax, None] - oc[ax]) / dn[ax]
                tb = (bx[:, 2 * ax + 1, None] - oc[ax]) / dn[ax]
                t_lo = np.maximum(t_lo, np.minimum(ta, tb))
                mx = np.maximum(ta, tb)
                hi_st = np.minimum(hi_st, mx)
                hi_pr = np.minimum(hi_pr, mx)
            vis_tot += v
            stat_tot += int((t_lo <= hi_st).any(axis=1).sum())
            touch_pr = t_lo <= hi_pr                       # [V, RB]
            prog_tot += int(touch_pr.any(axis=1).sum())
            for q in subs:
                # Sub-group gate nests under the whole-block gate: only
                # block-touched tiles evaluate the q sub-predicates.
                tq = touch_pr.reshape(v, q, rb // q).any(axis=2)  # [V, q]
                blk = tq.any(axis=1)
                sub_tot[q] += int(tq.sum())
                subp_tot[q] += int(blk.sum()) * q
        tot_vis += vis_tot * st_rows * rb
        tot_stat += stat_tot * st_rows * rb
        tot_prog += prog_tot * st_rows * rb
        for q in subs:
            tot_sub[q] += sub_tot[q] * st_rows * (rb // q)
            tot_subp[q] += subp_tot[q]
        sub_str = " ".join(
            f"q{q}:{vis_tot*q/max(sub_tot[q],1):.2f}x" for q in subs)
        print(f"depth {depth}: visited {vis_tot:6d} tiles/{nb} blocks -> "
              f"static-touch {stat_tot:6d} ({vis_tot/max(stat_tot,1):.2f}x), "
              f"progressive {prog_tot:6d} "
              f"({vis_tot/max(prog_tot,1):.2f}x), sub-gate {sub_str}",
              flush=True)
    print(f"\n## any-touch skip at St={st_rows} RB={rb}: "
          f"contraction work /{tot_vis/max(tot_stat,1):.2f} static, "
          f"/{tot_vis/max(tot_prog,1):.2f} progressive "
          f"(lane-weighted, prod schedule unchanged)")
    for q in subs:
        print(f"##   sub-gate q={q:2d}: MACs /{tot_vis/max(tot_sub[q],1):.2f}"
              f" vs ungated (/{tot_prog/max(tot_sub[q],1):.2f} vs whole-"
              f"block gate); {tot_subp[q]/1e3:.1f}k sub-predicates/branches")


def main():
    t0 = time.perf_counter()
    scene, snaps = collect_snapshots_cached()
    print(f"# snapshots in {time.perf_counter() - t0:.0f}s", flush=True)
    tri = scene.triangles

    if "--keys" in sys.argv:
        grids = {32: build_tri_grid(tri, tile_rows=32)}
        key_variant_sweep(scene, snaps, grids)
        return
    if "--partition" in sys.argv:
        partition_sweep(scene, snaps)
        return
    if "--ideal" in sys.argv:
        ideal_sweep(scene, snaps)
        return
    if "--anyskip" in sys.argv:
        anyskip_sweep(scene, snaps,
                      st_rows=int(os.environ.get("TKS_ST", 64)),
                      rb=int(os.environ.get("TKS_RB", 2048)))
        return
    if "--dda" in sys.argv:
        dda_expansion_sweep(
            scene, snaps, rb=int(os.environ.get("TKS_RB", 512)),
            st_rows=int(os.environ.get("TKS_ST", 32)),
            grid_n=int(os.environ.get("TKS_G", 4)),
            k_max=int(os.environ.get("TKS_K", 8)))
        return
    if "--capped" in sys.argv:
        capped_key_sweep(scene, snaps,
                         st_rows=int(os.environ.get("TKS_ST", 32)),
                         rb=int(os.environ.get("TKS_RB", 512)))
        return

    grids = {}
    for st_rows in TILE_ROWS:
        grids[st_rows] = build_tri_grid(tri, tile_rows=st_rows)
        print(f"# grid St={st_rows}: {grids[st_rows].n_tiles} tiles",
              flush=True)

    # True best-t per snapshot (grid-independent): the exact oracle on
    # the default grid, with the sphere pass's t as the occlusion cap.
    from win32_raytracer_tpu.ops.hit import hit_spheres
    totals = {}
    for depth, o, d, tm, alive in snaps:
        sel = np.flatnonzero(alive)
        if not len(sel):
            continue
        # production lane order: bin-sort alive lanes over the mesh box
        sb = np.asarray(grids[64].scene_box, np.float64)
        lo3, ext = sb[0::2], np.maximum(sb[1::2] - sb[0::2], 1e-6)
        box = tuple(float(x) for x in lo3) + tuple(
            float(1.0 / e) for e in ext)
        n_a = len(sel)
        st = PathState(
            origin=jnp.asarray(o[:, sel]),
            direction=jnp.asarray(d[:, sel]),
            time=jnp.asarray(tm[:, sel]),
            throughput=jnp.ones((3, n_a), jnp.float32),
            radiance_sum=jnp.zeros((3, n_a), jnp.float32),
            depth=jnp.zeros((1, n_a), jnp.int32),
            sample=jnp.zeros((1, n_a), jnp.int32),
            pixel=jnp.arange(n_a, dtype=jnp.int32)[None],
            path_alive=jnp.ones((1, n_a), bool),
            s_base=jnp.zeros((1, n_a), jnp.int32),
            s_quota=jnp.ones((1, n_a), jnp.int32),
        )
        st = _bin_sort(st, box=box)
        o_s = np.asarray(st.origin)
        d_s = np.asarray(st.direction)
        tm_s = np.asarray(st.time)

        # Column-layout sphere oracle (ops/hit.py); misses carry F32_MAX,
        # so t_sph caps the tri pass exactly like dispatch's composite.
        rec_s = hit_spheres(scene.spheres, jnp.asarray(o_s.T),
                            jnp.asarray(d_s.T), jnp.asarray(tm_s[0]))
        t_sph = np.asarray(rec_s.t)
        t_tri, _ = hit_triangles_grid_jnp(
            grids[64], jnp.asarray(o_s), jnp.asarray(d_s),
            jnp.asarray(tm_s), t_cap=jnp.asarray(t_sph[None]))
        best = np.minimum(np.asarray(t_tri)[0], t_sph)

        print(f"\n## depth {depth} ({n_a} alive lanes, bin-sorted)")
        base = None
        for st_rows in TILE_ROWS:
            for rb in RAY_BLOCKS:
                sched, vis, nb = eval_combo(
                    grids[st_rows], o_s, d_s, tm_s, best, rb)
                pw_full = sched * st_rows * rb / 1e6
                pw_ee = vis * st_rows * rb / 1e6
                merge = vis * rb * MERGE_COST / 14.0 / 1e6
                cost = pw_ee + merge
                if base is None:
                    base = cost
                totals.setdefault((st_rows, rb), 0.0)
                totals[(st_rows, rb)] += cost * n_a  # lane-weighted
                print(f"St={st_rows:4d} RB={rb:5d}: sched {sched:6d} "
                      f"visit {vis:6d} tiles/blk {vis / nb:6.1f} | "
                      f"pairs full {pw_full:7.1f}M ee {pw_ee:7.1f}M "
                      f"+merge-> {cost:7.1f}M ({cost / base:5.2f}x)",
                      flush=True)

    print("\n## lane-weighted totals over all snapshot depths")
    base = min(totals.values())
    for (st_rows, rb), c in sorted(totals.items(), key=lambda kv: kv[1]):
        print(f"St={st_rows:4d} RB={rb:5d}: {c / base:5.2f}x")


if __name__ == "__main__":
    main()
