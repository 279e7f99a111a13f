"""Pallas TPU fused scatter + respawn kernel (lane-major).

The persistent scheduler's non-hit half of a bounce — material scatter
(RayTracer.cpp:604-688 semantics, all reference quirks), state update, and
immediate camera-sample respawn (the scheduler's load-balancing trick) — is
pure elementwise row math, but XLA's codegen for the long masked-select
chain runs at ~30% VPU (docs/axon_runtime_notes.md), costing ~9.3 ms per
3.84M-lane step where the arithmetic is worth ~2-3 ms.  This kernel
hand-schedules the whole phase as one VMEM-resident block program and
generates its 10 uniforms/lane with the on-core PRNG
(``pltpu.prng_random_bits``) instead of a separate XLA pass.

Semantics match persistent._scatter_core + persistent._respawn_core: the
kernel reimplements core.rng.hash_uniform01 with global lane counters, so
its uniform DRAWS are bit-identical to the jnp step's.  Per-lane results
agree to float round-off — the kernel uses reciprocal-multiply forms
(``x * (1/w)`` vs ``x / w``, ``omc^5`` by multiplies vs ``jnp.power``),
so a threshold decision (Schlick reflect, RR survive, metal absorb) can
flip on a rare lane whose draw sits within an ulp of the threshold; the
two paths are statistically equivalent Monte Carlo estimators, not
lane-exact.  The jnp path remains the oracle and the CPU-backend
fallback.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..core import materials as mat
from ..scene.camera import Camera

DEFAULT_RAY_BLOCK_SCAT = 2048

# Packed camera row layout (f32 [CAM_ROWS, 1] VMEM operand).
_C_ORIGIN = 0      # 3
_C_LLC = 3         # 3
_C_HORIZ = 6       # 3
_C_VERT = 9        # 3
_C_RIGHT = 12      # 3
_C_UP = 15         # 3
_C_LENS = 18
_C_SH_OPEN = 19
_C_SH_CLOSE = 20
CAM_ROWS = 21

_TWO_PI = np.float32(2.0 * np.pi)
_INV24 = np.float32(1.0 / (1 << 24))


def pack_camera(cam: Camera) -> jnp.ndarray:
    """Camera pytree -> [CAM_ROWS, 1] f32 rows (kernel operand)."""
    return jnp.concatenate([
        jnp.asarray(cam.origin, jnp.float32).reshape(3),
        jnp.asarray(cam.lower_left_corner, jnp.float32).reshape(3),
        jnp.asarray(cam.horizontal, jnp.float32).reshape(3),
        jnp.asarray(cam.vertical, jnp.float32).reshape(3),
        jnp.asarray(cam.right_axis, jnp.float32).reshape(3),
        jnp.asarray(cam.up_axis, jnp.float32).reshape(3),
        jnp.asarray(cam.lens_radius, jnp.float32).reshape(1),
        jnp.asarray(cam.shutter_open, jnp.float32).reshape(1),
        jnp.asarray(cam.shutter_close, jnp.float32).reshape(1),
    ]).reshape(CAM_ROWS, 1)


def pack_cameras(cams) -> jnp.ndarray:
    """[CAM_ROWS, F] camera matrix for multi-frame batches (one column
    per animation frame; scatter_respawn_values selects per lane)."""
    return jnp.concatenate([pack_camera(c) for c in cams], axis=1)


def exact_divmod(x, d):
    """Floor divmod of i32 ``x`` by a positive TRACED i32 scalar ``d`` —
    Mosaic cannot lower vector integer division by a traced scalar, so
    this goes through f32 reciprocal-multiply plus integer correction.
    EXACT for -d <= x < 2^24 and 1 <= d < 2^24: at x <= 2^24 the f32
    product's absolute error is < 2, so two correction steps each way
    close it.  (The drivers gate Mosaic paths on pixel ids fitting this
    range — persistent.py ``mosaic_dims_ok``.)"""
    d_f = d.astype(jnp.float32)
    q = (x.astype(jnp.float32) * (1.0 / d_f)).astype(jnp.int32)
    r = x - q * d
    for _ in range(2):
        neg = (r < 0).astype(jnp.int32)
        q = q - neg
        r = r + neg * d
    for _ in range(2):
        ge = (r >= d).astype(jnp.int32)
        q = q + ge
        r = r - ge * d
    return q, r


def _div_kpp(pix, kpp, kpp_shift):
    """pix // kpp for the lanes-per-pixel stride: a traced-scalar shift
    when kpp is a power of two (every auto kpp; exact at ANY pixel id),
    else exact_divmod (driver guarantees the < 2^24 range then)."""
    sh = jnp.maximum(kpp_shift, 0).astype(jnp.uint32)
    shifted = jax.lax.shift_right_logical(
        pix.astype(jnp.uint32), jnp.broadcast_to(sh, pix.shape)
    ).astype(jnp.int32)
    return jnp.where(kpp_shift >= 0, shifted, exact_divmod(pix, kpp)[0])


def kernel_draws(sp_ref, r: int):
    """In-kernel core.rng.hash_uniform01 with GLOBAL lane counters — the
    draws are bit-identical to the jnp step's (and need no pltpu PRNG,
    which interpret mode lacks).  Returns [10, R]: rows 0-4 the scatter
    stream, 5-9 the respawn stream."""
    salt_u = jnp.uint32(sp_ref[0])          # i32 arg carries the u32 bits
    step_u = jnp.uint32(sp_ref[1])
    k1 = jnp.uint32(0x85EBCA6B)
    k2 = jnp.uint32(0xC2B2AE35)

    def fmix(x):
        x = (x ^ (x >> 16)) * k1
        x = (x ^ (x >> 13)) * k2
        return x ^ (x >> 16)

    lane = (jnp.uint32(pl.program_id(0) * r)
            + jax.lax.broadcasted_iota(jnp.uint32, (5, r), 1))
    row = jax.lax.broadcasted_iota(jnp.uint32, (5, r), 0)

    def draws(purpose):
        s = fmix(step_u * jnp.uint32(0x9E3779B9) ^ salt_u
                 ^ jnp.uint32(purpose))
        x = fmix(lane ^ fmix(s + row * k1))
        # Mosaic can't lower u32->f32 directly; x>>8 fits 24 bits, so the
        # int32 hop is exact.
        return (x >> 8).astype(jnp.int32).astype(jnp.float32) * _INV24

    drw_s = draws(0x5CA77E12)   # scatter stream (persistent._scatter_core)
    drw_r = draws(0x2E59A301)   # respawn stream (persistent._respawn_core)
    return jnp.concatenate([drw_s, drw_r], axis=0)     # [10, R]


def scatter_respawn_values(
    drw, cam_ref, o, d, tm, thr, dep, smp, pix, alive, sb, sq,
    hp, nrm, mat_id_rows, alb, fuzz_rows, ior_rows,
    *, cfg: RenderConfig, width, height, kpp, kpp_shift, kx, ky,
    max_depth, rr_start, lean: bool = False,
):
    """The scatter + state-update + respawn math on VALUES (rows), shared
    by the standalone scatter kernel and the fused bounce kernel.

    ``width``/``height``/``kpp``/``kpp_shift``/``kx``/``ky``/``max_depth``
    /``rr_start`` are TRACED i32 scalars (the dims operand, decoded from
    SMEM by the kernels) — one compiled program per lane count serves
    every image size, stratify grid, and RR setting.  Pixel-id decoding
    uses exact_divmod, exact while per-frame pixel counts stay < 2^24
    (persistent.py mosaic_dims_ok gates the callers).

    Returns (origin, direction, time, throughput, depth, sample, alive) —
    all new-state rows.

    ``cam_ref`` is [CAM_ROWS, F]: F == 1 renders one frame; F > 1 renders
    F animation frames in ONE batch (pixel-lane ids span a virtual
    F*height image; persistent._respawn_core's multi-frame contract) and
    the camera is selected per lane by frame id."""
    n_frames = cam_ref.shape[1]
    # Pixel-id decode (shared by the respawn below): lane id -> pixel ->
    # (x, y[, frame]).
    pix_d = _div_kpp(pix, kpp, kpp_shift)
    ypix, xpix = exact_divmod(pix_d, width)
    if n_frames == 1:
        def cam_row(k):
            return cam_ref[k:k + 1, 0:1]              # [1, 1] broadcasts
    else:
        fid_all, ypix = exact_divmod(ypix, height)    # frame, local row

        def cam_row(k):
            v = cam_ref[k:k + 1, 0:1]
            for f in range(1, n_frames):
                v = jnp.where(fid_all == f, cam_ref[k:k + 1, f:f + 1], v)
            return v

    def dot3(ax, ay, az, bx, by, bz):
        return ax * bx + ay * by + az * bz

    eps = np.float32(cfg.epsilon)
    ox, oy, oz = o[0:1], o[1:2], o[2:3]
    dx, dy, dz = d[0:1], d[1:2], d[2:3]
    nx, ny, nz = nrm[0:1], nrm[1:2], nrm[2:3]
    hx, hy, hz = hp[0:1], hp[1:2], hp[2:3]
    mat_id = mat_id_rows[0:1]
    fuzz = fuzz_rows[0:1]
    ior = ior_rows[0:1]
    tm_ref = tm  # row aliases keep the body below unchanged
    thr_ref = thr
    dep_ref = dep
    smp_ref = smp
    pix_ref = pix
    sb_ref = sb
    sq_ref = sq
    alb_ref = alb

    # --- unit-ball sample (core.rng.sample_unit_ball) ---
    bz_ = 1.0 - 2.0 * drw[0:1]
    phi = _TWO_PI * drw[1:2]
    # Mosaic has no cbrt; exp(log(x)/3) matches to ulps (and log(0) ->
    # -inf -> exp -> 0, the right limit).
    br = jnp.exp(jnp.log(drw[2:3]) * np.float32(1.0 / 3.0))
    bs = jnp.sqrt(jnp.maximum(0.0, 1.0 - bz_ * bz_))
    ballx = br * bs * jnp.cos(phi)
    bally = br * bs * jnp.sin(phi)
    ballz = br * bz_

    # --- lambertian (RayTracer.cpp:604-617) ---
    lam_ox, lam_oy, lam_oz = hx + eps * nx, hy + eps * ny, hz + eps * nz
    one_eps = np.float32(1.0) - eps
    lam_dx = one_eps * nx + ballx
    lam_dy = one_eps * ny + bally
    lam_dz = one_eps * nz + ballz

    # --- metal (RayTracer.cpp:618-635) ---
    dn2 = 2.0 * dot3(dx, dy, dz, nx, ny, nz)
    refl_x, refl_y, refl_z = dx - dn2 * nx, dy - dn2 * ny, dz - dn2 * nz
    met_dx = refl_x + fuzz * ballx
    met_dy = refl_y + fuzz * bally
    met_dz = refl_z + fuzz * ballz
    met_ok = dot3(met_dx, met_dy, met_dz, nx, ny, nz) > 0.0

    # --- dielectric (RayTracer.cpp:636-688, quirks preserved) ---
    inv_len = jax.lax.rsqrt(jnp.maximum(dot3(dx, dy, dz, dx, dy, dz), 1e-37))
    ndx, ndy, ndz = -dx * inv_len, -dy * inv_len, -dz * inv_len
    entering = dot3(ndx, ndy, ndz, nx, ny, nz) > 0.0
    ni = jnp.where(entering, 1.0 / ior, ior)
    rfnx = jnp.where(entering, nx, -nx)
    rfny = jnp.where(entering, ny, -ny)
    rfnz = jnp.where(entering, nz, -nz)
    roffx, roffy, roffz = eps * nx, eps * ny, eps * nz

    cosine = dot3(ndx, ndy, ndz, rfnx, rfny, rfnz)
    sa = ni if cfg.schlick_uses_ni_over_nt else ior
    r0 = (1.0 - sa) / (1.0 + sa)
    r0 = r0 * r0
    omc = 1.0 - cosine
    omc5 = omc * omc
    omc5 = omc5 * omc5 * omc
    reflect_prob = r0 + (1.0 - r0) * omc5
    is_refl = (np.float32(cfg.reflect_thres) + drw[3:4]) < reflect_prob

    dt = dot3(ndx, ndy, ndz, rfnx, rfny, rfnz)
    disc = np.float32(cfg.refract_discriminant_bias) - ni * ni * (1.0 - dt * dt)
    refr_ok = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    refr_x = ni * (ndx - rfnx * dt) - rfnx * sq
    refr_y = ni * (ndy - rfny * dt) - rfny * sq
    refr_z = ni * (ndz - rfnz * dt) - rfnz * sq
    dnr2 = 2.0 * dot3(dx, dy, dz, rfnx, rfny, rfnz)
    tir_x, tir_y, tir_z = dx - dnr2 * rfnx, dy - dnr2 * rfny, dz - dnr2 * rfnz

    die_dx = jnp.where(is_refl, refl_x, jnp.where(refr_ok, refr_x, tir_x))
    die_dy = jnp.where(is_refl, refl_y, jnp.where(refr_ok, refr_y, tir_y))
    die_dz = jnp.where(is_refl, refl_z, jnp.where(refr_ok, refr_z, tir_z))
    # origin: hp -/+ refract_offset with refract_offset = -+eps*n by
    # entering (ops/rows.py scatter_rows) — the two flips multiply.
    back = is_refl | ~refr_ok
    sgn = jnp.where(back, -1.0, 1.0) * jnp.where(entering, -1.0, 1.0)
    die_ox = hx + sgn * roffx
    die_oy = hy + sgn * roffy
    die_oz = hz + sgn * roffz

    is_met = mat_id == mat.METAL
    is_die = mat_id == mat.DIELECTRIC
    # Metal shares the lambertian origin (hp + eps*n), so origins are a
    # two-way select.
    new_ox = jnp.where(is_die, die_ox, lam_ox)
    new_oy = jnp.where(is_die, die_oy, lam_oy)
    new_oz = jnp.where(is_die, die_oz, lam_oz)
    new_dx = jnp.where(is_die, die_dx, jnp.where(is_met, met_dx, lam_dx))
    new_dy = jnp.where(is_die, die_dy, jnp.where(is_met, met_dy, lam_dy))
    new_dz = jnp.where(is_die, die_dz, jnp.where(is_met, met_dz, lam_dz))
    att_r = jnp.where(is_die, 1.0, alb_ref[0:1])
    att_g = jnp.where(is_die, 1.0, alb_ref[1:2])
    att_b = jnp.where(is_die, 1.0, alb_ref[2:3])
    # Mask algebra, not jnp.where-on-bools: Mosaic lowers bool selects
    # through i8 and fails truncating back to i1.
    sc_alive = ~is_met | met_ok

    # --- state update (persistent._scatter_core) ---
    thr_r = jnp.where(alive, thr_ref[0:1] * att_r, thr_ref[0:1])
    thr_g = jnp.where(alive, thr_ref[1:2] * att_g, thr_ref[1:2])
    thr_b = jnp.where(alive, thr_ref[2:3] * att_b, thr_ref[2:3])
    cur_ox = jnp.where(alive, new_ox, ox)
    cur_oy = jnp.where(alive, new_oy, oy)
    cur_oz = jnp.where(alive, new_oz, oz)
    cur_dx = jnp.where(alive, new_dx, dx)
    cur_dy = jnp.where(alive, new_dy, dy)
    cur_dz = jnp.where(alive, new_dz, dz)
    depth = jnp.where(alive, dep_ref[0:1] + 1, dep_ref[0:1])
    alive2 = alive & sc_alive & (depth <= max_depth)

    # Russian roulette, traced via rr_start (rr_start > max_depth leaves
    # thr/alive bit-identical) — but compiled OUT entirely when the
    # static ``lean`` flag says RR is off for this render: the identity
    # is exact, so skipping the block changes nothing except the ~10
    # VPU ops/lane/step it costs (and its unused draw row DCEs away).
    if not lean:
        p = jnp.clip(jnp.maximum(jnp.maximum(thr_r, thr_g), thr_b),
                     0.05, 1.0)
        rr_on = alive2 & (depth >= rr_start)
        survive = drw[4:5] < p
        inv_p = 1.0 / p
        thr_r = jnp.where(rr_on, thr_r * inv_p, thr_r)
        thr_g = jnp.where(rr_on, thr_g * inv_p, thr_g)
        thr_b = jnp.where(rr_on, thr_b * inv_p, thr_b)
        alive2 = alive2 & (~rr_on | survive)

    # --- respawn (persistent._respawn_core) ---
    sample = smp_ref[0:1]
    start = ~alive2 & (sample < sq_ref[0:1] - 1)
    new_sample = jnp.where(start, sample + 1, sample)

    u_j, v_j = drw[5:6], drw[6:7]
    # Stratified jitter, traced via (kx, ky) — (1, 1) reproduces the
    # plain jitter bit-exactly ((0 + u) * 1.0) — and compiled OUT (two
    # exact_divmod chains, ~30 VPU ops/lane/step) when the static
    # ``lean`` flag says stratification is off for this render.
    if not lean:
        gs = sb_ref[0:1] + new_sample
        gsq, sx_i = exact_divmod(gs, kx)
        _, sy_i = exact_divmod(gsq, ky)
        u_j = ((sx_i.astype(jnp.float32) + u_j)
               * (1.0 / kx.astype(jnp.float32)))
        v_j = ((sy_i.astype(jnp.float32) + v_j)
               * (1.0 / ky.astype(jnp.float32)))
    u = ((xpix.astype(jnp.float32) + u_j)
         * (1.0 / width.astype(jnp.float32)))
    v = (((height - ypix).astype(jnp.float32) + v_j)
         * (1.0 / height.astype(jnp.float32)))

    tm_new = cam_row(_C_SH_OPEN) + (
        cam_row(_C_SH_CLOSE) - cam_row(_C_SH_OPEN)) * drw[7:8]
    lr = jnp.sqrt(drw[8:9]) * cam_row(_C_LENS)
    th = _TWO_PI * drw[9:10]
    lc, ls = lr * jnp.cos(th), lr * jnp.sin(th)
    cam_ox = cam_row(_C_ORIGIN) + cam_row(_C_RIGHT) * lc + cam_row(_C_UP) * ls
    cam_oy = (cam_row(_C_ORIGIN + 1) + cam_row(_C_RIGHT + 1) * lc
              + cam_row(_C_UP + 1) * ls)
    cam_oz = (cam_row(_C_ORIGIN + 2) + cam_row(_C_RIGHT + 2) * lc
              + cam_row(_C_UP + 2) * ls)
    cam_dx = (cam_row(_C_LLC) + u * cam_row(_C_HORIZ)
              + v * cam_row(_C_VERT) - cam_ox)
    cam_dy = (cam_row(_C_LLC + 1) + u * cam_row(_C_HORIZ + 1)
              + v * cam_row(_C_VERT + 1) - cam_oy)
    cam_dz = (cam_row(_C_LLC + 2) + u * cam_row(_C_HORIZ + 2)
              + v * cam_row(_C_VERT + 2) - cam_oz)

    out_o = jnp.concatenate([jnp.where(start, cam_ox, cur_ox),
                             jnp.where(start, cam_oy, cur_oy),
                             jnp.where(start, cam_oz, cur_oz)], axis=0)
    out_d = jnp.concatenate([jnp.where(start, cam_dx, cur_dx),
                             jnp.where(start, cam_dy, cur_dy),
                             jnp.where(start, cam_dz, cur_dz)], axis=0)
    out_tm = jnp.where(start, tm_new, tm_ref[0:1])
    out_thr = jnp.concatenate([jnp.where(start, 1.0, thr_r),
                               jnp.where(start, 1.0, thr_g),
                               jnp.where(start, 1.0, thr_b)], axis=0)
    out_dep = jnp.where(start, 0, depth)
    out_alv = (alive2 | start).astype(jnp.int32)
    return out_o, out_d, out_tm, out_thr, out_dep, new_sample, out_alv


def dims_scalars(sp_ref):
    """Decode the traced dims scalars from the SMEM scalar-prefetch
    vector (sp = [salt, step] ++ persistent.make_dims layout)."""
    return dict(width=sp_ref[2], height=sp_ref[3], kpp=sp_ref[4],
                kpp_shift=sp_ref[5], kx=sp_ref[6], ky=sp_ref[7],
                max_depth=sp_ref[8], rr_start=sp_ref[9])


SP_ROWS = 10  # salt, step + the 8 make_dims entries


def _scatter_respawn_kernel(
    sp_ref,                                  # [SP_ROWS] i32 SMEM
    cam_ref,                                 # [CAM_ROWS, 1] f32
    o_ref, d_ref, tm_ref, thr_ref,           # [3|3|1|3, R] f32
    dep_ref, smp_ref, pix_ref, alv_ref,      # [1, R] i32 (alv 0/1)
    sb_ref, sq_ref,                          # [1, R] i32
    hp_ref, nrm_ref,                         # [3, R] f32
    mat_ref,                                 # [1, R] i32
    alb_ref, fz_ref, ior_ref,                # [3|1|1, R] f32
    oo_ref, od_ref, otm_ref, othr_ref,       # outputs
    odep_ref, osmp_ref, oalv_ref,
    *, cfg: RenderConfig, lean: bool = False,
):
    drw = kernel_draws(sp_ref, o_ref.shape[1])
    (out_o, out_d, out_tm, out_thr, out_dep, out_smp,
     out_alv) = scatter_respawn_values(
        drw, cam_ref, o_ref[:, :], d_ref[:, :], tm_ref[:, :],
        thr_ref[:, :], dep_ref[:, :], smp_ref[:, :], pix_ref[:, :],
        alv_ref[0:1] > 0, sb_ref[:, :], sq_ref[:, :],
        hp_ref[:, :], nrm_ref[:, :], mat_ref[:, :], alb_ref[:, :],
        fz_ref[:, :], ior_ref[:, :],
        cfg=cfg, lean=lean, **dims_scalars(sp_ref))
    oo_ref[:, :] = out_o
    od_ref[:, :] = out_d
    otm_ref[:, :] = out_tm
    othr_ref[:, :] = out_thr
    odep_ref[:, :] = out_dep
    osmp_ref[:, :] = out_smp
    oalv_ref[:, :] = out_alv


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ray_block", "interpret", "lean"))
def _scatter_respawn_pallas_raw(
    sp, cam_rows, o, d, tm, thr, dep, smp, pix, alv, sb, sq,
    hp, nrm, mat_id, alb, fz, ior,
    *, cfg, ray_block, interpret=False, lean=False):
    n = o.shape[1]
    nb = n // ray_block
    kernel = functools.partial(_scatter_respawn_kernel, cfg=cfg,
                               lean=lean)

    def rowspec(rows):
        return pl.BlockSpec((rows, ray_block), lambda i, s: (0, i),
                            memory_space=pltpu.VMEM)

    cam_spec = pl.BlockSpec((CAM_ROWS, cam_rows.shape[1]),
                            lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[cam_spec,
                  rowspec(3), rowspec(3), rowspec(1), rowspec(3),
                  rowspec(1), rowspec(1), rowspec(1), rowspec(1),
                  rowspec(1), rowspec(1),
                  rowspec(3), rowspec(3), rowspec(1), rowspec(3),
                  rowspec(1), rowspec(1)],
        out_specs=[rowspec(3), rowspec(3), rowspec(1), rowspec(3),
                   rowspec(1), rowspec(1), rowspec(1)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(sp, cam_rows, o, d, tm, thr, dep, smp, pix, alv, sb, sq,
      hp, nrm, mat_id, alb, fz, ior)


def pack_sp(salt, step_i, dims) -> jnp.ndarray:
    """[SP_ROWS] i32 SMEM scalar-prefetch vector: (salt, step) ++ dims
    (persistent.make_dims).  Shared by the scatter and fused-bounce
    kernels."""
    salt_bits = jax.lax.bitcast_convert_type(
        jnp.asarray(salt, jnp.uint32), jnp.int32)
    head = jnp.stack([salt_bits, jnp.asarray(step_i, jnp.int32)])
    return jnp.concatenate([head, jnp.asarray(dims, jnp.int32)])


def scatter_respawn_pallas(scene, cam, st, rec, salt, step_i, dims, *,
                           cfg: RenderConfig, n_frames: int = 1,
                           ray_block: int = DEFAULT_RAY_BLOCK_SCAT,
                           interpret: bool = False, lean: bool = False):
    """Drop-in replacement for persistent.p_scatter_respawn_step.

    ``scene`` is accepted (and ignored) for signature parity, and so is
    ``n_frames`` — the kernel derives the frame count from the packed
    camera width (pass a camera LIST for multi-frame batches).  ``dims``
    is persistent.make_dims.  The batch must be a multiple of
    ``ray_block`` (the scheduler's sizes are); other sizes are padded
    with dead zero-quota lanes.
    """
    del n_frames
    from ..persistent import PathState

    n = st.origin.shape[1]
    pad = (-n) % ray_block
    if pad:
        def padded(a, fill=0):
            return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        st = PathState(*(padded(getattr(st, f)) for f in PathState._fields))
        rec = type(rec)(*(padded(x) for x in rec))

    sp = pack_sp(salt, step_i, dims)
    cam_rows = (pack_cameras(cam)
                if isinstance(cam, (list, tuple))
                and not isinstance(cam, Camera)
                else pack_camera(cam))
    o, d, tm, thr, dep, smp, alv = _scatter_respawn_pallas_raw(
        sp, cam_rows, st.origin, st.direction, st.time, st.throughput,
        st.depth, st.sample, st.pixel, st.path_alive.astype(jnp.int32),
        st.s_base, st.s_quota,
        rec.point, rec.normal, rec.mat_id, rec.albedo, rec.fuzz, rec.ior,
        cfg=cfg, ray_block=ray_block, interpret=interpret, lean=lean)
    out = st._replace(origin=o, direction=d, time=tm, throughput=thr,
                      depth=dep, sample=smp, path_alive=alv > 0)
    if pad:
        out = PathState(*(x[:, :n] for x in out))
    return out


# Jitted alias for the driver (same rationale as bounce_pallas.
# p_bounce_fused_jit): folds the eager packing/pad ops into the program.
scatter_respawn_pallas_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "n_frames", "ray_block",
                              "interpret", "lean"))(scatter_respawn_pallas)
