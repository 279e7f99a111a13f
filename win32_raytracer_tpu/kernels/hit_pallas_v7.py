"""Pallas TPU hit kernel v7: the ENTIRE hit phase as one kernel program.

bench/tpu_jobs anatomy (2026-08-17, 3.84M lanes x 512 spheres): the v6
pair kernel itself runs in ~2.5 ms, but the full jitted hit step costs
~32 ms — the difference is XLA's codegen for the row math AROUND the
pallas call (ray packing, winner-record assembly, sky/alive update),
which pessimizes badly in programs that mix a pallas call with an XLA
epilogue (docs/axon_runtime_notes.md rule 11).  The fix is architectural:
move EVERYTHING into the kernel so the jitted step program is exactly one
pallas_call and XLA generates no elementwise code at all.

v7 = v6's split-bf16 MXU pair math (hit_pallas_v6.py) + in-kernel:
  * ray packing (|d|^2, feature rows) — was pack_rays_rows
  * winner-record assembly (point, normal via center lerp, material rows)
    — was hit_pallas_v4.assemble_hit_record_rows
  * the miss->sky radiance update and alive mask
    (persistent._hit_core semantics: RayTracer.cpp:690-701 sky gradient,
    miss adds throughput*sky, alive &= hit)

The step function p_hit_sky_step is a drop-in replacement for
persistent.p_hit_step for plain sphere scenes; sphere coefficient
matrices are precomputed once per render and passed as arrays.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_HIT_T
from ..ops.hit import (
    ATTR_COLS, F32_MAX,
    _A_T1, _A_INVDT, _A_RADIUS, _A_MAT, _A_ALR, _A_ALB, _A_FUZZ, _A_IOR,
    _A_IDX, _A_C1X, _A_DCX,
)
from ..ops.rows import HitRecordRows
from ..scene.spheres import SphereScene
from .hit_pallas_v6 import _PAIRS, mxu_pair_sweep

DEFAULT_RAY_BLOCK_V7 = 2048
_N_TERMS = 6


def hit_coeffs(scene: SphereScene, n_terms: int = 0):
    """(mb_stack, mc_stack, attrs) — precompute ONCE per render.

    ``n_terms`` (0 = default 6): limb-pair count of the split-bf16
    quadratic (hit_pallas_v6._PAIRS).  6 = ~f32 quality (K=96); 3 =
    3-pass quality (K=48, half the MXU work) at the documented
    grazing-accuracy stance.  The kernels derive the pair list from the
    coeff stack's K dimension, so the choice lives entirely in which
    coeffs a caller builds (cfg.hit_terms)."""
    from .hit_pallas_v6 import _coeffs_v6
    return _coeffs_v6(scene, n_terms=n_terms or _N_TERMS)


def hit_sky_values(o, d, tm, thr, rad, alive, mb, mc, attrs,
                   *, n_spheres, min_t):
    """The hit + assembly + sky phase on VALUES (rows), shared by the
    standalone v7 kernel and the fused bounce kernel.

    Returns (t, point, normal, idx_f32-as-i32, mat, albedo, fuzz, ior,
    hit_bool, rad_out, alive_out_bool)."""
    a = jnp.sum(d * d, axis=0, keepdims=True)
    ta_min, g = mxu_pair_sweep(
        o, d, tm, a, mb, mc, attrs,
        n_spheres=n_spheres, min_t=min_t,
        pairs=_PAIRS[mb.shape[1] // 16])

    hit = ta_min < F32_MAX
    t = jnp.where(hit, ta_min / a, F32_MAX)
    t_safe = jnp.where(hit, t, 0.0)
    point = o + t_safe * d
    lerp = (tm - g[_A_T1:_A_T1 + 1]) * g[_A_INVDT:_A_INVDT + 1]
    center = g[_A_C1X:_A_C1X + 3] + g[_A_DCX:_A_DCX + 3] * lerp
    radius = g[_A_RADIUS:_A_RADIUS + 1]
    denom = jnp.where(radius == 0.0, 1.0, radius)
    normal = (point - center) / denom

    # Sky + alive update (persistent._hit_core / RayTracer.cpp:690-701).
    # Guard like ops.rows.rnormalize (d / max(sqrt(a), 1e-37)); note
    # max(a, 1e-74) would NOT work — 1e-74 underflows f32 to 0.
    inv = 1.0 / jnp.maximum(jnp.sqrt(a), np.float32(1e-37))
    sky_t = 0.5 * (d[1:2] * inv + 1.0)                    # [1, R]
    sky_r = (1.0 - sky_t) + sky_t * np.float32(0.5)
    sky_g = (1.0 - sky_t) + sky_t * np.float32(0.7)
    sky_b = (1.0 - sky_t) + sky_t * np.float32(1.0)
    miss = alive & ~hit
    rad_out = jnp.concatenate([
        rad[0:1] + jnp.where(miss, thr[0:1] * sky_r, 0.0),
        rad[1:2] + jnp.where(miss, thr[1:2] * sky_g, 0.0),
        rad[2:3] + jnp.where(miss, thr[2:3] * sky_b, 0.0)], axis=0)
    alive_out = alive & hit
    return (t, point, normal, g[_A_IDX:_A_IDX + 1],
            g[_A_MAT:_A_MAT + 1], g[_A_ALR:_A_ALB + 1],
            g[_A_FUZZ:_A_FUZZ + 1], g[_A_IOR:_A_IOR + 1],
            hit, rad_out, alive_out)


def _hit_sky_kernel(
    mb_ref, mc_ref, attrs_ref,               # [S, K] bf16 x2, [S, 16] f32
    o_ref, d_ref, tm_ref,                    # [3|3|1, R] f32
    thr_ref, rad_ref, alv_ref,               # [3|3|1, R] f32/f32/i32
    t_ref, pt_ref, nrm_ref,                  # outputs
    idx_ref, mat_ref, alb_ref, fz_ref, ior_ref,
    hit_ref, orad_ref, oalv_ref,
    *, n_spheres, min_t,
):
    (t, point, normal, idx_f, mat_f, albedo, fuzz, ior, hit, rad_out,
     alive_out) = hit_sky_values(
        o_ref[:, :], d_ref[:, :], tm_ref[:, :], thr_ref[:, :],
        rad_ref[:, :], alv_ref[:, :] > 0,
        mb_ref[:, :], mc_ref[:, :], attrs_ref[:, :],
        n_spheres=n_spheres, min_t=min_t)
    orad_ref[:, :] = rad_out
    oalv_ref[:, :] = alive_out.astype(jnp.int32)
    t_ref[:, :] = t
    pt_ref[:, :] = point
    nrm_ref[:, :] = normal
    idx_ref[:, :] = idx_f.astype(jnp.int32)
    mat_ref[:, :] = mat_f.astype(jnp.int32)
    alb_ref[:, :] = albedo
    fz_ref[:, :] = fuzz
    ior_ref[:, :] = ior
    hit_ref[:, :] = hit.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("min_t", "ray_block", "interpret"))
def _hit_sky_raw(mb, mc, attrs, o, d, tm, thr, rad, alv, *, min_t,
                 ray_block, interpret=False):
    n = o.shape[1]
    s = attrs.shape[0]
    k = mb.shape[1]
    kernel = functools.partial(_hit_sky_kernel, n_spheres=s, min_t=min_t)

    def rowspec(rows):
        return pl.BlockSpec((rows, ray_block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def whole(r, c_):
        return pl.BlockSpec((r, c_), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n // ray_block,),
        in_specs=[whole(s, k), whole(s, k), whole(s, ATTR_COLS),
                  rowspec(3), rowspec(3), rowspec(1),
                  rowspec(3), rowspec(3), rowspec(1)],
        out_specs=[rowspec(1), rowspec(3), rowspec(3),
                   rowspec(1), rowspec(1), rowspec(3), rowspec(1),
                   rowspec(1), rowspec(1), rowspec(3), rowspec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),   # t
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # point
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # normal
            jax.ShapeDtypeStruct((1, n), jnp.int32),     # idx
            jax.ShapeDtypeStruct((1, n), jnp.int32),     # mat
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # albedo
            jax.ShapeDtypeStruct((1, n), jnp.float32),   # fuzz
            jax.ShapeDtypeStruct((1, n), jnp.float32),   # ior
            jax.ShapeDtypeStruct((1, n), jnp.int32),     # hit
            jax.ShapeDtypeStruct((3, n), jnp.float32),   # radiance out
            jax.ShapeDtypeStruct((1, n), jnp.int32),     # alive out
        ],
        interpret=interpret,
    )(mb, mc, attrs, o, d, tm, thr, rad, alv)


def _fit_ray_block(n: int, cap: int) -> int:
    """Largest 128-multiple divisor of n that is <= cap (0 if none)."""
    rb = 0
    for cand in range(128, cap + 1, 128):
        if n % cand == 0:
            rb = cand
    return rb


def p_hit_sky_step(coeffs, st, *, min_t: float = MIN_HIT_T,
                   ray_block: int = DEFAULT_RAY_BLOCK_V7,
                   interpret: bool = False):
    """Drop-in for persistent.p_hit_step on plain sphere scenes.

    ``coeffs`` = hit_coeffs(scene), precomputed once per render.  Returns
    (HitRecordRows, st') with radiance_sum/path_alive updated — the whole
    phase is ONE pallas program, no XLA elementwise code.  Batches that
    are not a multiple of ``ray_block`` get a smaller fitting block, or —
    last resort — dead-lane padding (costs the XLA pad/slice around the
    kernel, so the drivers should size chunks to lane multiples)."""
    mb, mc, attrs = coeffs
    n = st.origin.shape[1]
    rb = ray_block if n % ray_block == 0 else _fit_ray_block(n, ray_block)
    pad = 0 if rb else (-n) % ray_block
    if pad:
        rb = ray_block

        def padded(x, fill=0):
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
        o = padded(st.origin)
        d = padded(st.direction).at[2, n:].set(1.0)
        args = (o, d, padded(st.time), padded(st.throughput),
                padded(st.radiance_sum),
                padded(st.path_alive.astype(jnp.int32)))
    else:
        args = (st.origin, st.direction, st.time, st.throughput,
                st.radiance_sum, st.path_alive.astype(jnp.int32))
    (t, point, normal, idx, mat_id, albedo, fuzz, ior, hit, rad,
     alv) = _hit_sky_raw(
        mb, mc, attrs, *args,
        min_t=float(min_t), ray_block=rb, interpret=interpret)
    if pad:
        (t, point, normal, idx, mat_id, albedo, fuzz, ior, hit, rad,
         alv) = (x[:, :n] for x in (t, point, normal, idx, mat_id, albedo,
                                    fuzz, ior, hit, rad, alv))
    rec = HitRecordRows(hit=hit > 0, t=t, point=point, normal=normal,
                        idx=idx, mat_id=mat_id, albedo=albedo, fuzz=fuzz,
                        ior=ior)
    return rec, st._replace(radiance_sum=rad, path_alive=alv > 0)
