"""Pallas TPU hit kernel v6: v5's MXU quadratic at split-bf16 precision.

v5 (hit_pallas_v5.py) factored the ray-sphere quadratic's dot products
into two [S,16]x[16,R] MXU contractions and measured the precision wall:
1-pass bf16 is 1.7x faster than the VPU sweep (v4) but corrupts the
discriminant (27% winner flips); f32 Precision.HIGHEST costs 6 bf16
passes and loses the win.  Mosaic has no 3-pass Precision.HIGH.

v6 builds the 3-pass product manually — and pays for it in the K
dimension of a SINGLE bf16 matmul instead of multiple passes.  Split
every f32 operand into bf16 limbs (x = x0 + x1 + ..., x0 = bf16(x),
x1 = bf16(x - x0), ...; each limb adds ~8 mantissa bits), pick a list of
limb-product pairs, and stack them along K:

    x*y  ~  sum_{(i,j) in PAIRS} x_i * y_j
    M_stack = [M_{i0} | M_{i1} | ...]   [S, 16*len(PAIRS)]  (host-built)
    F_stack = [F_{j0} ; F_{j1} ; ...]   [16*len(PAIRS), R]  (in-kernel)
    M.F     =  one dot_general(M_stack, F_stack), bf16 in / f32 out

PAIRS = (0,0),(0,1),(1,0) reproduces 3-pass quality (~2^-17 relative per
product) at K=48 — for a [S=512]x[R=2048] pair block the MXU work is
still negligible next to the [S, R] VPU epilogue, so this runs at
~1-pass speed.  ``n_terms=6`` adds (1,1),(0,2),(2,0) for ~f32 quality
(K=96) at a few % more time.

Accuracy stance: with n_terms=3 the discriminant carries O(1e-3)
absolute error from O(300)-magnitude coefficient products, so rays
within ~1e-3 of tangency can flip hit/miss, and two spheres with
near-equal t can swap winners.  Both are grazing-measure-zero events
(none occur on the RTIOW scenes' golden tests at 2^-17; the jnp oracle
remains the exactness reference).  Descendant of the reference AVX sweep
win32-raytracer/RayTracer.cpp:433-589 like v4/v5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_HIT_T
from ..ops.hit import ATTR_COLS, F32_MAX, _attr_matrix
from ..ops.rows import HitRecordRows
from ..scene.spheres import SphereScene
from .hit_pallas_v4 import assemble_hit_record_rows, pack_rays_rows

DEFAULT_RAY_BLOCK_V6 = 2048

_NFEAT = 16  # feature rows (padded to a sublane multiple)


def sphere_coeff_matrices(scene: SphereScene):
    """Per-sphere coefficient matrices (M_b, M_c), each [S, 16].

    Motion-lerped centers are linear in shutter time — ``c(tm) = A_s +
    B_s*tm`` — so each per-pair dot product of the quadratic is bilinear
    in per-ray features and these per-sphere coefficients (derivation in
    experimental/hit_pallas_v5.py, where this factoring was measured in).

    Rows of the ray-feature vector F (built in-kernel):
      0..2  d         3..5  tm*d
      6..8  o         9..11 tm*o
      12    1         13    tm        14 tm^2      15 (zero pad)
    M_b uses rows 0..5; M_c uses rows 6..14.
    """
    s = scene.padded_size
    inv_dt = 1.0 / (scene.t2 - scene.t1)
    a_c = scene.center1 - (scene.center2 - scene.center1) * (
        scene.t1 * inv_dt)[:, None]
    b_c = (scene.center2 - scene.center1) * inv_dt[:, None]
    r2 = scene.radius * scene.radius
    # Park padding lanes so c is huge positive -> disc hugely negative.
    parked = ~scene.active
    big = jnp.float32(1e18)

    m_b = jnp.zeros((s, _NFEAT), jnp.float32)
    m_b = m_b.at[:, 0:3].set(a_c).at[:, 3:6].set(b_c)
    m_b = jnp.where(parked[:, None], 0.0, m_b)

    m_c = jnp.zeros((s, _NFEAT), jnp.float32)
    m_c = m_c.at[:, 6:9].set(-2.0 * a_c).at[:, 9:12].set(-2.0 * b_c)
    m_c = m_c.at[:, 13].set(2.0 * jnp.sum(a_c * b_c, axis=1))
    m_c = m_c.at[:, 14].set(jnp.sum(b_c * b_c, axis=1))
    m_c = jnp.where(parked[:, None], 0.0, m_c)
    m_c = m_c.at[:, 12].set(jnp.where(
        parked, big, jnp.sum(a_c * a_c, axis=1) - r2))
    return m_b, m_c

# Limb-product pairs per accuracy tier: term (i, j) contributes
# M_limb[i] * F_limb[j].  3 = Precision.HIGH equivalent; 6 ~ HIGHEST.
_PAIRS = {
    3: ((0, 0), (0, 1), (1, 0)),
    6: ((0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0)),
}


def _split_limbs(x: jnp.ndarray, n: int):
    """f32 -> n bf16 limbs summing to ~x (each limb ~8 more mantissa bits).

    The limb value is extracted by MASKING the low 16 mantissa bits (bf16
    is exactly the top half of an f32), NOT by a bf16 round-trip: under
    ``--xla_allow_excess_precision=true`` (set on the target runtime) XLA
    elides ``f32 -> bf16 -> f32`` as an identity, which silently zeroes
    every limb after the first.  Bit ops can't be elided, and the
    truncated remainder is exactly representable, so ``sum(limbs) == x``
    to f32 after 3 limbs."""
    limbs = []
    rem = x
    for _ in range(n):
        hi = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(rem, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)
        limbs.append(hi.astype(jnp.bfloat16))
        rem = rem - hi
    return limbs


def stack_coeff_limbs(m: jnp.ndarray, n_terms: int) -> jnp.ndarray:
    """[S, 16] f32 -> [S, 16*n_terms] bf16: limb i at K-slot p for each
    pair p=(i, j) (host side, once per scene)."""
    pairs = _PAIRS[n_terms]
    n_limbs = 1 + max(i for i, _ in pairs)
    limbs = _split_limbs(m, n_limbs)
    return jnp.concatenate([limbs[i] for i, _ in pairs], axis=1)


def mxu_pair_sweep(o, d, tm, a, mb, mc, attrs, *, n_spheres, min_t, pairs):
    """The split-bf16 MXU pair sweep, shared by the v6 and v7 kernels.

    o/d [3, R], tm/a [1, R] f32; mb/mc [S, K] bf16 limb stacks; attrs
    [S, 16] f32.  Returns (ta_min [1, R] — min of t*|d|^2 with F32_MAX
    for no-hit — and g [16, R], the winner's attribute rows)."""
    d_dot_o = jnp.sum(d * o, axis=0, keepdims=True)      # [1, R]
    o2 = jnp.sum(o * o, axis=0, keepdims=True)           # [1, R]
    ones = jnp.ones_like(tm)
    feats = jnp.concatenate(
        [d, tm * d, o, tm * o, ones, tm, tm * tm, jnp.zeros_like(tm)],
        axis=0)                                           # [16, R] f32
    n_limbs = 1 + max(j for _, j in pairs)
    # Limbs kept in f32 (each is exactly bf16-representable) and converted
    # once after the concat: concatenating bf16 [16, R] blocks along
    # sublanes inside Mosaic produced corrupted layouts.
    f_limbs = [l.astype(jnp.float32) for l in _split_limbs(feats, n_limbs)]
    f_stack = jnp.concatenate(
        [f_limbs[j] for _, j in pairs], axis=0).astype(jnp.bfloat16)

    def pair_mm(m):
        # [S, 16*P] x [16*P, R] -> [S, R]: every limb product in ONE
        # bf16 MXU contraction, f32 accumulate.
        return jax.lax.dot_general(
            m, f_stack,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    b_half = d_dot_o - pair_mm(mb)                        # [S, R]
    c = o2 + pair_mm(mc)                                  # [S, R]
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

    g = jax.lax.dot_general(
        attrs, onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [16, R]
    return ta_min, g


def _hit_kernel_v6(rays_ref, mb_ref, mc_ref, attrs_ref, t_ref, g_ref,
                   *, n_spheres, min_t, n_terms):
    """rays [8, R]; M_b/M_c [S, 16*n_terms] bf16; attrs [S, 16];
    outputs t [1, R], winner attr rows [16, R]."""
    a = rays_ref[7:8, :]
    ta_min, g = mxu_pair_sweep(
        rays_ref[0:3, :], rays_ref[3:6, :], rays_ref[6:7, :], a,
        mb_ref[:, :], mc_ref[:, :], attrs_ref[:, :],
        n_spheres=n_spheres, min_t=min_t, pairs=_PAIRS[n_terms])
    g_ref[:, :] = g
    t_ref[:, :] = jnp.where(ta_min < F32_MAX, ta_min / a, F32_MAX)


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block", "n_terms",
                                             "interpret"))
def _hit_pallas_v6_raw(rays_t, mb_stack, mc_stack, attrs, *, min_t,
                       ray_block, n_terms, interpret=False):
    n = rays_t.shape[1]
    s = attrs.shape[0]
    k = mb_stack.shape[1]
    kernel = functools.partial(_hit_kernel_v6, n_spheres=s, min_t=min_t,
                               n_terms=n_terms)
    return pl.pallas_call(
        kernel,
        grid=(n // ray_block,),
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k), lambda i: (0, 0),
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
    )(rays_t, mb_stack, mc_stack, attrs)


# Coeff stacks memoized on the scene object's identity: they were
# jit-dispatched per render call (and per STEP on the v6-as-step path),
# which taxes short renders.  Entries keep a strong ref to the scene so
# the id key stays valid; bounded FIFO (same pattern as
# tri_accel._GRID_CACHE).  The host cache replaces the old jax.jit
# wrapper: under jit the scene leaves are tracers and an id() key would
# never hit.
_COEFF_CACHE: dict = {}
_COEFF_CACHE_MAX = 8
_coeffs_v6_compute = functools.partial(
    jax.jit, static_argnames=("n_terms",))(
        lambda scene, *, n_terms: (
            stack_coeff_limbs(sphere_coeff_matrices(scene)[0], n_terms),
            stack_coeff_limbs(sphere_coeff_matrices(scene)[1], n_terms),
            _attr_matrix(scene)))


def _coeffs_v6(scene: SphereScene, *, n_terms: int):
    key = (id(scene), n_terms)
    hit = _COEFF_CACHE.get(key)
    if hit is not None and hit[0] is scene:
        return hit[1]
    out = _coeffs_v6_compute(scene, n_terms=n_terms)
    if len(_COEFF_CACHE) >= _COEFF_CACHE_MAX:
        _COEFF_CACHE.pop(next(iter(_COEFF_CACHE)))
    _COEFF_CACHE[key] = (scene, out)
    return out


def hit_spheres_pallas_v6(
    scene: SphereScene,
    origin: jnp.ndarray,     # [3, N]
    direction: jnp.ndarray,  # [3, N]
    time: jnp.ndarray,       # [1, N]
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_RAY_BLOCK_V6,
    n_terms: int = 3,
    interpret: bool = False,
) -> HitRecordRows:
    """Rows-layout nearest-hit sweep, MXU quadratic at split-bf16
    precision (see module docstring for the accuracy stance)."""
    n = origin.shape[1]
    pad = (-n) % ray_block
    rays_t = pack_rays_rows(origin, direction, time)
    if pad:
        filler = jnp.zeros((8, pad), jnp.float32).at[7, :].set(1.0)
        rays_t = jnp.concatenate([rays_t, filler], axis=1)

    mb_stack, mc_stack, attrs = _coeffs_v6(scene, n_terms=n_terms)
    t_out, gt = _hit_pallas_v6_raw(
        rays_t, mb_stack, mc_stack, attrs, min_t=float(min_t),
        ray_block=ray_block, n_terms=n_terms, interpret=interpret)
    rec = assemble_hit_record_rows(
        rays_t[0:3], rays_t[3:6], rays_t[6:7], t_out, gt)
    if pad:
        rec = HitRecordRows(*(x[:, :n] for x in rec))
    return rec
