"""Hit-kernel backend selection.

``auto`` uses the Pallas kernel on TPU (the production path) and the pure
jnp implementation elsewhere (CPU tests, oracle comparisons).  The jnp path
is also the correctness oracle for the Pallas kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..ops.hit import hit_spheres as hit_spheres_jnp
from .hit_pallas_v3 import hit_spheres_pallas_v3


@functools.lru_cache(maxsize=None)
def _default_platform() -> str:
    return jax.devices()[0].platform


def _resolve_backend(cfg: RenderConfig, platform=None) -> str:
    """'auto' -> 'pallas' on TPU-like platforms, 'jnp' elsewhere.

    ``platform`` overrides the default-device platform — sharded paths pass
    their MESH devices' platform (a virtual-CPU mesh under the axon tunnel
    must NOT pick Pallas just because the default device is the TPU relay).
    The axon platform is the TPU tunnel; plain 'tpu' for direct runs."""
    if cfg.backend != "auto":
        return cfg.backend
    plat = platform or _default_platform()
    return "pallas" if plat in ("tpu", "axon") else "jnp"


def _pallas_v3_rb2048(scene, o, d, t, min_t=0.001):
    return hit_spheres_pallas_v3(scene, o, d, t, min_t=min_t, ray_block=2048)


def get_hit_fn(cfg: RenderConfig, scene=None, platform=None):
    """Resolve cfg.backend ('auto' | 'pallas' | 'jnp') to a hit function.

    When ``scene`` is given, the returned function also handles triangle
    and composite scenes (spheres on the selected backend; triangles on
    the jnp sweep)."""
    backend = _resolve_backend(cfg, platform)
    if backend == "pallas":
        # v3 (transposed layout, rb=2048) measured fastest; bit-identical
        # to v1 on the RTIOW scenes.
        sphere_fn = _pallas_v3_rb2048
    elif backend == "jnp":
        sphere_fn = hit_spheres_jnp
    else:
        raise ValueError(f"unknown backend {backend!r} (use auto|pallas|jnp)")
    if scene is None:
        return sphere_fn
    from ..scene.composite import make_hit_fn
    tri_fn = None
    if backend == "pallas":
        from .tri_pallas import hit_triangles_pallas
        tri_fn = hit_triangles_pallas
    return make_hit_fn(scene, sphere_fn, tri_fn=tri_fn)


def _pallas_v4_rb2048(scene, o, d, t, min_t=0.001):
    from .hit_pallas_v4 import hit_spheres_pallas_v4
    return hit_spheres_pallas_v4(scene, o, d, t, min_t=min_t, ray_block=2048)


def _make_tri_pass(kernel, rb, rebin, dda_k, **kernel_kw):
    """Triangle-pass wrapper over a grid-sweep ``kernel``, shared by the
    Pallas and jnp twins (the jnp path is the CI/verification oracle, so
    the rebin/dda wiring must be literally the same code): three-way
    branch between the plain sweep, the occlusion-capped working-set
    sort (kernels/tri_rebin.py), and DDA macro-cell expansion
    (kernels/tri_dda.py).  ``kernel_kw`` forwards kernel-specific knobs
    (the Pallas sweep's ``early_exit``)."""
    def tf(g, o2, d2, t2, min_t=0.001, t_cap=None):
        return kernel(g, o2, d2, t2, min_t=min_t, t_cap=t_cap,
                      ray_block=rb, **kernel_kw)

    def tri_pass(grid, o, d, t, min_t, t_cap):
        if rebin in ("on", "dda"):
            if t_cap is None:
                t_cap = jnp.full_like(o[:1], np.float32(3.4e38))
            if rebin == "dda":
                from .tri_dda import dda_tri_pass
                kw = {"k_max": dda_k} if dda_k else {}
                return dda_tri_pass(tf, grid, o, d, t, t_cap,
                                    min_t=min_t, **kw)
            from .tri_rebin import sorted_tri_pass
            return sorted_tri_pass(tf, grid, o, d, t, t_cap, min_t=min_t)
        return tf(grid, o, d, t, min_t=min_t, t_cap=t_cap)
    return tri_pass


def _make_composite(sphere_fn, tri_pass):
    """Rows hit fn over a (spheres?, TriGridScene) composite: the cheap
    sphere pass runs first and its nearest t CAPS the triangle block
    mask — a sphere hit occludes every farther tile."""
    from ..ops.rows import combine_hits_rows
    from ..tri_accel import TriGridScene

    def composite(sc, o, d, t, min_t=0.001):
        if isinstance(sc, TriGridScene):
            return tri_pass(sc, o, d, t, min_t, None)
        if sc.spheres is None:
            return tri_pass(sc.triangles, o, d, t, min_t, None)
        rec = sphere_fn(sc.spheres, o, d, t, min_t=min_t)
        rec_t = tri_pass(sc.triangles, o, d, t, min_t, rec.t)
        return combine_hits_rows(rec, rec_t,
                                 idx_offset_b=sc.spheres.padded_size)
    return composite


@functools.lru_cache(maxsize=16)
def _tri_grid_fn(sphere_fn, ray_block=0, early_exit=True, rebin=False,
                 dda_k=0, any_skip=True, n_sub=1, gather="fused"):
    """Rows hit fn for scenes whose triangle side carries a TriGridScene.

    ``ray_block`` 0 = the kernel default; ``early_exit`` = the
    front-to-back in-kernel stop (cfg.tri_early_exit); ``rebin`` = the
    two-phase occlusion-capped working-set sort (cfg.tri_rebin,
    kernels/tri_rebin.py); ``any_skip`` = the in-kernel exact any-touch
    contraction gate (cfg.tri_any_skip); ``n_sub`` = that gate's
    sub-group granularity (cfg.tri_sub_gate); ``gather`` = the winner-
    attribute path, in-kernel one-hot merge vs post-sweep index gather
    (cfg.tri_gather).  Cached: hit fns are static jit args downstream."""
    from .tri_grid_rows import (
        DEFAULT_TRI_GRID_RAY_BLOCK, hit_triangles_grid_rows,
    )

    rb = ray_block or DEFAULT_TRI_GRID_RAY_BLOCK
    tri_pass = _make_tri_pass(hit_triangles_grid_rows, rb, rebin, dda_k,
                              early_exit=early_exit, any_skip=any_skip,
                              n_sub=n_sub, gather=gather)
    return _make_composite(sphere_fn, tri_pass)


@functools.lru_cache(maxsize=16)
def _tri_grid_fn_jnp(ray_block=0, rebin=False, dda_k=0):
    """jnp twin of _tri_grid_fn: the pure-jnp grid sweep
    (tri_accel.hit_triangles_grid_rows_jnp) with the jnp column-oracle
    sphere pass capping the triangle mask.  Cached: static jit args."""
    from ..ops.hit import hit_spheres
    from ..ops.rows import hit_rows_adapter
    from ..tri_accel import hit_triangles_grid_rows_jnp

    rb = ray_block or 512
    sphere_fn = hit_rows_adapter(hit_spheres)
    tri_pass = _make_tri_pass(hit_triangles_grid_rows_jnp, rb, rebin, dda_k)
    return _make_composite(sphere_fn, tri_pass)


def get_hit_fn_rows_accel(cfg: RenderConfig, scene, cam, platform=None):
    """Resolve (scene, rows hit fn) with the acceleration structure applied.

    Sphere side: with ``cfg.accel == "grid"``, a Pallas backend, and a
    plain sphere scene that qualifies (accel.build_grid_accel), returns
    the GridScene and the grid rows kernel.  "auto" resolves to the brute
    sweep there — on the RTIOW scene the footprint-mask grid wins only on
    coherent (primary) batches (bench/mask_stats.py).

    Triangle side: with ``cfg.accel`` in ("auto", "grid") and a Pallas
    backend, meshes of >= tri_accel.build_tri_grid's min_tris get the
    Morton-tile grid AUTOMATICALLY — the brute MXU sweep scales linearly
    in triangle count and is hopeless at bunny scale (VERDICT round-1
    item 3).  "off" forces brute everywhere.

    ``platform`` overrides the backend-resolution platform — sharded paths
    must pass their MESH devices' platform (a virtual-CPU mesh under the
    axon tunnel must NOT pick Pallas just because the default device is the
    TPU relay)."""
    from ..scene.composite import CompositeScene
    from ..scene.spheres import SphereScene
    from ..scene.triangles import TriangleScene

    if cfg.tri_rebin not in ("auto", "on", "dda", "off"):
        raise ValueError(
            f"tri_rebin must be auto|on|dda|off, got {cfg.tri_rebin!r}")
    if cfg.tri_any_skip not in ("auto", "on", "off"):
        raise ValueError(
            f"tri_any_skip must be auto|on|off, got {cfg.tri_any_skip!r}")
    if cfg.tri_dda_k < 0:
        raise ValueError(
            f"tri_dda_k must be >= 0 (0 = kernel default), got "
            f"{cfg.tri_dda_k}")
    if cfg.tri_sub_gate not in (0, 1, 2, 4, 8, 16):
        raise ValueError(
            f"tri_sub_gate must be 0 (auto) or a power of two <= 16, "
            f"got {cfg.tri_sub_gate}")
    if cfg.tri_gather not in ("auto", "fused", "deferred"):
        raise ValueError(
            f"tri_gather must be auto|fused|deferred, got "
            f"{cfg.tri_gather!r}")
    backend = _resolve_backend(cfg, platform)
    if (cfg.accel == "grid" and backend == "pallas"
            and isinstance(scene, SphereScene)):
        from ..accel import build_grid_accel
        gs = build_grid_accel(scene, time_hi=float(cam.shutter_close))
        if gs is not None:
            from .hit_grid_rows import hit_spheres_grid_rows
            return gs, hit_spheres_grid_rows

    if cfg.accel in ("auto", "grid"):
        tri = (scene if isinstance(scene, TriangleScene)
               else scene.triangles
               if isinstance(scene, CompositeScene) else None)
        if tri is not None and (backend == "pallas"
                                or cfg.accel == "grid"):
            from ..tri_accel import build_tri_grid
            part = ("morton" if cfg.tri_partition == "auto"
                    else cfg.tri_partition)
            grid = (build_tri_grid(tri, tile_rows=cfg.tri_tile_rows,
                                   partition=part)
                    if cfg.tri_tile_rows
                    else build_tri_grid(tri, partition=part))
            if grid is not None:
                has_spheres = (isinstance(scene, CompositeScene)
                               and scene.spheres is not None)
                new_scene = (scene._replace(triangles=grid)
                             if has_spheres else grid)
                if backend == "pallas":
                    sphere_fn = None
                    if has_spheres:
                        sphere_fn = (_pallas_v6_rb2048
                                     if cfg.hit_kernel in ("auto", "v6",
                                                           "v7")
                                     else _pallas_v4_rb2048)
                    any_skip = cfg.tri_any_skip in ("auto", "on")
                    # Sub-gate auto: q=2 at tile heights >= 128 — the
                    # measured winner there (tpu_jobs 593c: 11.25 vs
                    # 10.3 Mrays/s at the config-4 shape, every
                    # interleaved rep; each gated sub-contraction saves
                    # 2x the MACs per constant pl.when branch).  At
                    # St < 128 the branch costs what it saves (job 578:
                    # q2 wash, q4+ monotone losses), so auto stays 1.
                    n_sub = cfg.tri_sub_gate
                    if n_sub == 0:
                        from ..tri_accel import DEFAULT_TILE_ROWS
                        from .tri_grid_rows import (
                            DEFAULT_TRI_GRID_RAY_BLOCK)
                        st_eff = cfg.tri_tile_rows or DEFAULT_TILE_ROWS
                        rb_eff = (cfg.tri_ray_block
                                  or DEFAULT_TRI_GRID_RAY_BLOCK)
                        n_sub = (2 if any_skip and st_eff >= 128
                                 and rb_eff % 256 == 0 else 1)
                    return new_scene, _tri_grid_fn(
                        sphere_fn, cfg.tri_ray_block,
                        early_exit=cfg.tri_early_exit in ("auto", "on"),
                        rebin="off" if cfg.tri_rebin == "auto"
                        else cfg.tri_rebin, dda_k=cfg.tri_dda_k,
                        any_skip=any_skip,
                        n_sub=n_sub,
                        gather="fused" if cfg.tri_gather == "auto"
                        else cfg.tri_gather)
                # jnp backend, explicit accel="grid": the pure-jnp grid
                # sweep (tri_accel.hit_triangles_grid_rows_jnp).  No mask
                # savings without Mosaic — this is the CI/verification
                # path for the grid + ray-binning drivers on jnp hosts
                # ("auto" keeps the cheaper brute sweep there).
                return new_scene, _tri_grid_fn_jnp(
                    cfg.tri_ray_block,
                    rebin="off" if cfg.tri_rebin == "auto"
                    else cfg.tri_rebin, dda_k=cfg.tri_dda_k)

    if cfg.accel == "grid":
        raise ValueError(
            "accel='grid' requested but the scene/backend does not qualify "
            "(sphere grids need a Pallas backend and enough small spheres "
            "— accel.build_grid_accel; triangle grids need a mesh with "
            "enough triangles — tri_accel.build_tri_grid — on any "
            "backend)")
    return scene, get_hit_fn_rows(cfg, scene, platform)


def _pallas_v6_rb2048(scene, o, d, t, min_t=0.001):
    from .hit_pallas_v6 import hit_spheres_pallas_v6
    return hit_spheres_pallas_v6(scene, o, d, t, min_t=min_t,
                                 ray_block=2048, n_terms=6)


def _tri_mxu_rb2048(scene, o, d, t, min_t=0.001):
    from .tri_pallas_mxu import hit_triangles_mxu_rows
    return hit_triangles_mxu_rows(scene, o, d, t, min_t=min_t,
                                  ray_block=2048)


@functools.lru_cache(maxsize=16)
def _rows_composite_fn(sphere_fn, tri_fn):
    """Rows-native composite hit fn (cached: hit fns are static jit args
    downstream, so the same composite must return the same object)."""
    from ..ops.rows import combine_hits_rows

    def composite(sc, o, d, t, min_t=0.001):
        if sc.spheres is None:
            return tri_fn(sc.triangles, o, d, t, min_t=min_t)
        rec = sphere_fn(sc.spheres, o, d, t, min_t=min_t)
        if sc.triangles is None:
            return rec
        rec_t = tri_fn(sc.triangles, o, d, t, min_t=min_t)
        return combine_hits_rows(rec, rec_t,
                                 idx_offset_b=sc.spheres.padded_size)
    return composite


def get_hit_fn_rows(cfg: RenderConfig, scene=None, platform=None):
    """Rows-layout hit function (ops/rows.py interface) for the persistent
    scheduler.  On a Pallas backend every scene kind gets a native
    lane-major kernel: plain sphere scenes the v6 MXU split-bf16
    quadratic (cfg.hit_kernel can force the exact v4 VPU sweep),
    triangle scenes the MXU Möller-Trumbore sweep (tri_pallas_mxu), and
    composites the rows-native nearest-of-both merge.  The jnp oracle
    path goes through the cached column adapter."""
    from ..ops.rows import hit_rows_adapter
    from ..scene.composite import CompositeScene
    from ..scene.spheres import SphereScene
    from ..scene.triangles import TriangleScene

    backend = _resolve_backend(cfg, platform)
    if backend == "pallas":
        if cfg.hit_kernel in ("auto", "v6", "v7"):
            # "v7" selects the fused hit+sky pallas step in the drivers;
            # as a plain hit FUNCTION (tail/fused paths) it means v6 —
            # the same pair math without the in-kernel epilogue.
            sphere_fn = _pallas_v6_rb2048
        elif cfg.hit_kernel == "v4":
            sphere_fn = _pallas_v4_rb2048
        else:
            raise ValueError(f"unknown hit_kernel {cfg.hit_kernel!r} "
                             "(use auto|v4|v6|v7)")
        if scene is None or isinstance(scene, SphereScene):
            return sphere_fn
        if isinstance(scene, TriangleScene):
            return _tri_mxu_rb2048
        if isinstance(scene, CompositeScene):
            return _rows_composite_fn(sphere_fn, _tri_mxu_rb2048)
    return hit_rows_adapter(get_hit_fn(cfg, scene, platform))
