"""Pallas TPU hit kernel v5: the quadratic's dot products on the MXU.

The brute kernels (v3/v4) are VPU-ALU-bound: ~40 vector-op slots per
(ray, sphere) pair, most of them computing motion-lerped centers and the
three dot products of the quadratic (the descendant of the reference AVX
sweep, win32-raytracer/RayTracer.cpp:433-551).  But centers are *linear in
shutter time* — ``c(tm) = A_s + B_s * tm`` with per-sphere coefficients
``A = c1 - dc*t1*invdt``, ``B = dc*invdt`` — so every per-pair dot product
is bilinear in per-ray features and per-sphere coefficients:

    b_half[r,s] = d.o  - [d, tm*d] . [A; B]
    c[r,s]      = |o|^2 + [o, tm*o, 1, tm, tm^2]
                          . [-2A; -2B; |A|^2 - rad^2; 2A.B; |B|^2]

Two [S,16]x[16,R] MXU contractions produce b_half and c for the whole
pair block; the VPU keeps only ~15 slots per pair (discriminant, sqrt,
winner select).  The per-pair division by ``a=|d|^2`` is also hoisted to
one division per ray: winners are selected on ``t*a`` (a > 0).

Interface: rows layout (ops.rows), like v4.  Sphere padding is masked
arithmetically: parked coefficient rows give a hugely negative
discriminant, and the b-feature rows stay zero so no NaN/Inf can arise.

STATUS: measured experiment, NOT the production default.  At MXU default
precision (1-pass bf16) this runs 1.7x faster than v4 (10.1 vs 17.2 ms /
2M rays x 512 spheres) but bf16 cannot resolve the discriminant — c is a
~300-magnitude sum deciding an ~r^2 = 0.04-scale sign, so 27% of winner
ids flip.  Precision.HIGHEST (6-pass f32) is exact but slower than v4
(20.2 ms); Mosaic does not implement Precision.HIGH (3-pass).  Kept as
the ready-made fast path for a hardware generation with f32 MXU passes
cheaper than 6x, and as documentation of the negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import MIN_HIT_T
from ...ops.hit import ATTR_COLS, F32_MAX, _attr_matrix
from ...ops.rows import HitRecordRows
from ...scene.spheres import SphereScene
from ..hit_pallas_v4 import assemble_hit_record_rows, pack_rays_rows

DEFAULT_RAY_BLOCK_V5 = 2048

# The coefficient construction graduated to production with v6; v5 keeps
# only the single-contraction kernel as the documented negative result.
from ..hit_pallas_v6 import _NFEAT, sphere_coeff_matrices  # noqa: E402


def _hit_kernel_v5(rays_ref, mb_ref, mc_ref, attrs_ref, t_ref, g_ref,
                   *, n_spheres, min_t):
    """rays [8, R]; M_b/M_c [S, 16]; attrs [S, 16] (winner gather);
    outputs t [1, R], winner attr rows [16, R]."""
    o = rays_ref[0:3, :]
    d = rays_ref[3:6, :]
    tm = rays_ref[6:7, :]
    a = rays_ref[7:8, :]

    d_dot_o = jnp.sum(d * o, axis=0, keepdims=True)      # [1, R]
    o2 = jnp.sum(o * o, axis=0, keepdims=True)           # [1, R]
    ones = jnp.ones_like(tm)
    feats = jnp.concatenate(
        [d, tm * d, o, tm * o, ones, tm, tm * tm, jnp.zeros_like(tm)],
        axis=0)                                           # [16, R]

    def pair(m_ref):
        # [S,16] x [16,R] -> [S,R] on the MXU.
        # HIGHEST: full-f32 MXU passes — the default bf16 contraction
        # corrupts the discriminant (c is a sum of O(100) terms).
        return jax.lax.dot_general(
            m_ref[:, :], feats,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    b_half = d_dot_o - pair(mb_ref)                       # [S, R]
    c = o2 + pair(mc_ref)                                 # [S, R]
    disc = b_half * b_half - a * c
    # Winner on t*a (a > 0 per ray): one division per ray, not per pair.
    ta = -b_half - jnp.sqrt(jnp.maximum(disc, 0.0))
    valid = (disc >= 0.0) & (ta > min_t * a)
    ta = jnp.where(valid, ta, F32_MAX)

    ta_min = jnp.min(ta, axis=0, keepdims=True)           # [1, R]
    eq = ta == ta_min
    sub = jax.lax.broadcasted_iota(jnp.int32, ta.shape, 0).astype(jnp.float32)
    big = jnp.float32(n_spheres + 1)
    winner = jnp.min(jnp.where(eq, sub, big), axis=0, keepdims=True)
    onehot = (sub == winner).astype(jnp.float32)          # [S, R]

    g_ref[:, :] = jax.lax.dot_general(
        attrs_ref[:, :], onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t_ref[:, :] = jnp.where(ta_min < F32_MAX, ta_min / a, F32_MAX)


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block", "interpret"))
def _hit_pallas_v5_raw(rays_t, m_b, m_c, attrs, *, min_t, ray_block,
                       interpret=False):
    n = rays_t.shape[1]
    s = attrs.shape[0]
    kernel = functools.partial(_hit_kernel_v5, n_spheres=s, min_t=min_t)
    return pl.pallas_call(
        kernel,
        grid=(n // ray_block,),
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, _NFEAT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, _NFEAT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, ATTR_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTR_COLS, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((ATTR_COLS, n), jnp.float32),
        ],
        interpret=interpret,
    )(rays_t, m_b, m_c, attrs)


def hit_spheres_pallas_v5(
    scene: SphereScene,
    origin: jnp.ndarray,     # [3, N]
    direction: jnp.ndarray,  # [3, N]
    time: jnp.ndarray,       # [1, N]
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_RAY_BLOCK_V5,
    interpret: bool = False,
) -> HitRecordRows:
    """Rows-layout nearest-hit sweep with MXU dot products."""
    n = origin.shape[1]
    pad = (-n) % ray_block
    rays_t = pack_rays_rows(origin, direction, time)
    if pad:
        filler = jnp.zeros((8, pad), jnp.float32).at[7, :].set(1.0)
        rays_t = jnp.concatenate([rays_t, filler], axis=1)

    m_b, m_c = sphere_coeff_matrices(scene)
    attrs = _attr_matrix(scene)
    t_out, gt = _hit_pallas_v5_raw(
        rays_t, m_b, m_c, attrs, min_t=float(min_t), ray_block=ray_block,
        interpret=interpret)
    rec = assemble_hit_record_rows(
        rays_t[0:3], rays_t[3:6], rays_t[6:7], t_out, gt)
    if pad:
        rec = HitRecordRows(*(x[:, :n] for x in rec))
    return rec
