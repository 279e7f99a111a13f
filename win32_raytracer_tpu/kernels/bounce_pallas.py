"""Pallas TPU fused bounce kernel: hit + sky + scatter + respawn in ONE
kernel program.

The two-program bounce (v7 hit kernel, then the scatter+respawn step)
reads the full path state from HBM twice and writes it twice per bounce.
This kernel chains hit_pallas_v7.hit_sky_values and
scatter_pallas.scatter_respawn_values inside one Mosaic program, so every
state row crosses HBM once per bounce and the hit record never
materializes at all.  Unlike the old XLA-fused p_bounce_step (2.5x
SLOWER — XLA's codegen for pallas+epilogue programs pessimizes, runtime
notes rule 11), there is NO XLA code here: the whole bounce is Mosaic.

Draw semantics are bit-identical to the two-step path (same
kernel_draws counters), so this is an exact drop-in; A/B against the
split path before defaulting (set RenderConfig.fuse_bounce)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..ops.hit import ATTR_COLS
from ..scene.camera import Camera
from .hit_pallas_v7 import _fit_ray_block, hit_sky_values
from .scatter_pallas import (
    CAM_ROWS, dims_scalars, kernel_draws, pack_camera, pack_cameras,
    pack_sp, scatter_respawn_values,
)

DEFAULT_RAY_BLOCK_BOUNCE = 2048


def _bounce_kernel(
    sp_ref,                                  # [SP_ROWS] i32 SMEM
    mb_ref, mc_ref, attrs_ref,               # coeffs
    cam_ref,                                 # [CAM_ROWS, 1]
    o_ref, d_ref, tm_ref, thr_ref, rad_ref,  # state in
    dep_ref, smp_ref, pix_ref, alv_ref, sb_ref, sq_ref,
    oo_ref, od_ref, otm_ref, othr_ref, orad_ref,   # state out
    odep_ref, osmp_ref, oalv_ref,
    *, cfg: RenderConfig, n_spheres, lean: bool = False,
):
    o = o_ref[:, :]
    d = d_ref[:, :]
    tm = tm_ref[:, :]
    thr = thr_ref[:, :]
    alive_in = alv_ref[:, :] > 0

    (t, point, normal, _idx, mat_f, albedo, fuzz, ior, _hit, rad_out,
     alive_hit) = hit_sky_values(
        o, d, tm, thr, rad_ref[:, :], alive_in,
        mb_ref[:, :], mc_ref[:, :], attrs_ref[:, :],
        n_spheres=n_spheres, min_t=cfg.min_hit_t)

    drw = kernel_draws(sp_ref, o.shape[1])
    (out_o, out_d, out_tm, out_thr, out_dep, out_smp,
     out_alv) = scatter_respawn_values(
        drw, cam_ref, o, d, tm, thr, dep_ref[:, :], smp_ref[:, :],
        pix_ref[:, :], alive_hit, sb_ref[:, :], sq_ref[:, :],
        point, normal, mat_f.astype(jnp.int32), albedo, fuzz, ior,
        cfg=cfg, lean=lean, **dims_scalars(sp_ref))

    oo_ref[:, :] = out_o
    od_ref[:, :] = out_d
    otm_ref[:, :] = out_tm
    othr_ref[:, :] = out_thr
    orad_ref[:, :] = rad_out
    odep_ref[:, :] = out_dep
    osmp_ref[:, :] = out_smp
    oalv_ref[:, :] = out_alv


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ray_block", "interpret", "lean"))
def _bounce_raw(sp, mb, mc, attrs, cam_rows,
                o, d, tm, thr, rad, dep, smp, pix, alv, sb, sq,
                *, cfg, ray_block, interpret=False, lean=False):
    n = o.shape[1]
    s = attrs.shape[0]
    k = mb.shape[1]
    kernel = functools.partial(_bounce_kernel, cfg=cfg, n_spheres=s,
                               lean=lean)

    def rowspec(rows):
        return pl.BlockSpec((rows, ray_block), lambda i, sp_: (0, i),
                            memory_space=pltpu.VMEM)

    def whole(r, c_):
        return pl.BlockSpec((r, c_), lambda i, sp_: (0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // ray_block,),
        in_specs=[whole(s, k), whole(s, k), whole(s, ATTR_COLS),
                  whole(CAM_ROWS, cam_rows.shape[1]),
                  rowspec(3), rowspec(3), rowspec(1), rowspec(3),
                  rowspec(3), rowspec(1), rowspec(1), rowspec(1),
                  rowspec(1), rowspec(1), rowspec(1)],
        out_specs=[rowspec(3), rowspec(3), rowspec(1), rowspec(3),
                   rowspec(3), rowspec(1), rowspec(1), rowspec(1)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # origin
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # direction
            jax.ShapeDtypeStruct((1, n), jnp.float32),   # time
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # throughput
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # radiance
            jax.ShapeDtypeStruct((1, n), jnp.int32),     # depth
            jax.ShapeDtypeStruct((1, n), jnp.int32),     # sample
            jax.ShapeDtypeStruct((1, n), jnp.int32),     # alive
        ],
        interpret=interpret,
    )(sp, mb, mc, attrs, cam_rows, o, d, tm, thr, rad, dep, smp, pix,
      alv, sb, sq)


def p_bounce_fused(coeffs, cam, st, salt, step_i, dims, *,
                   cfg: RenderConfig,
                   ray_block: int = DEFAULT_RAY_BLOCK_BOUNCE,
                   interpret: bool = False, lean: bool = False):
    """One full bounce (hit+sky+scatter+respawn) as a single Mosaic
    program.  Drop-in for (p_hit_sky_step; p_scatter_respawn_step) — the
    hit record is internal; ``dims`` is persistent.make_dims.  Batches
    without a fitting 128-multiple block fall back to dead-lane padding
    (zero-quota lanes never respawn), like p_hit_sky_step."""
    mb, mc, attrs = coeffs
    n = st.origin.shape[1]
    rb = ray_block if n % ray_block == 0 else _fit_ray_block(n, ray_block)
    pad = 0 if rb else (-n) % ray_block
    if pad:
        rb = ray_block
        from ..persistent import PathState

        def padded(a):
            return jnp.pad(a, ((0, 0), (0, pad)))
        st_in = PathState(*(padded(getattr(st, f)) for f in
                            PathState._fields))
        st_in = st_in._replace(
            direction=st_in.direction.at[2, n:].set(1.0))
    else:
        st_in = st
    sp = pack_sp(salt, step_i, dims)
    cam_rows = (pack_cameras(cam)
                if isinstance(cam, (list, tuple))
                and not isinstance(cam, Camera)
                else pack_camera(cam))
    o, d, tm, thr, rad, dep, smp, alv = _bounce_raw(
        sp, mb, mc, attrs, cam_rows,
        st_in.origin, st_in.direction, st_in.time, st_in.throughput,
        st_in.radiance_sum, st_in.depth, st_in.sample, st_in.pixel,
        st_in.path_alive.astype(jnp.int32), st_in.s_base, st_in.s_quota,
        cfg=cfg, ray_block=rb, interpret=interpret, lean=lean)
    if pad:
        (o, d, tm, thr, rad, dep, smp, alv) = (
            x[:, :n] for x in (o, d, tm, thr, rad, dep, smp, alv))
    return st._replace(origin=o, direction=d, time=tm, throughput=thr,
                       radiance_sum=rad, depth=dep, sample=smp,
                       path_alive=alv > 0)


# Jitted alias for the driver: the wrapper above runs its per-call
# packing (pack_sp concat, camera pack, bool->i32 casts, pad slices) as
# EAGER ops — each a separate dispatch over the remote runtime, several
# per bounce step.  Under one jit they fold into the step program.
# Evidence: tpu_jobs 612 chained the same Mosaic body through this eager
# wrapper (31.0 ms/bounce at 4M lanes) and through the sharded driver's
# fully-jitted step (22.1 ms) — a ~30% per-step wrapper tax.
p_bounce_fused_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "ray_block", "interpret", "lean"))(
        p_bounce_fused)


@functools.partial(
    jax.jit, static_argnames=("cfg", "k", "ray_block", "interpret",
                              "lean"))
def p_bounce_multi_fused(coeffs, cam, st, salt, step0, dims, *,
                         cfg: RenderConfig, k: int,
                         ray_block: int = DEFAULT_RAY_BLOCK_BOUNCE,
                         interpret: bool = False, lean: bool = False):
    """``k`` fused Mosaic bounces in ONE dispatch — the below-floor
    tail's dispatch economics (persistent.p_bounce_multi_step) at the
    fused kernel's per-lane-step cost (round-5 anatomy: the XLA multi
    core runs ~9.5-10 ns/lane-step where the Mosaic bounce runs 5.6;
    tpu_jobs 990).  The loop is UNROLLED python — k sequential
    pallas_calls in one program — never a lax loop: Mosaic inside
    while/fori is the one compile surface that failed on the real chip
    (bench.py's one_shot degrade path).  Draws are bit-identical to k
    successive p_bounce_fused calls at steps step0..step0+k-1."""
    for i in range(k):
        st = p_bounce_fused(coeffs, cam, st, salt, step0 + jnp.int32(i),
                            dims, cfg=cfg, ray_block=ray_block,
                            interpret=interpret, lean=lean)
    return st
