"""Pallas TPU ray-triangle kernel: Möller-Trumbore on the MXU (rows).

Möller-Trumbore's four per-pair quantities are all (at most) bilinear in
the ray's (o, d) — each triple product expands over the 9-entry o (x) d
outer product plus linear o/d terms with per-triangle coefficients:

    det   = d . (e2 x e1)                                (linear in d)
    u_num = s . (d x e2) = [o(x)d vs e2] - d . (e2 x v0)
    v_num = d . (s x e1) = [o(x)d vs e1] - d . (v0 x e1)
    t_num = e2 . (s x e1) = o . (e1 x e2) - v0 . (e1 x e2)
    (s = o - v0;  u = u_num/det, v = v_num/det, t = t_num/det)

so the whole sweep becomes four [T, K] x [K, R] MXU contractions against
one 16-row ray-feature stack [o, d, o(x)d, 1], at split-bf16 precision
(hit_pallas_v6's limb trick, 6 terms), with only the ~14-slot
validity/winner epilogue on the VPU — the triangle analogue of the v6
sphere kernel.  Semantics match ops/hit_tri.hit_triangles exactly
(two-sided, det-epsilon degenerate rejection, nearest-t earliest-index
winner); padded/inactive triangles park with all-zero coefficients
(det = 0 -> rejected), which subsumes the oracle's active mask.

Extension component: the reference renders spheres only (SURVEY.md #10);
meshes are BASELINE.json config 4.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_HIT_T
from ..ops.hit import F32_MAX
from ..ops.hit_tri import (
    TRI_ATTR_COLS, _DET_EPS,
    _T_E1X, _T_E1Z, _T_E2X, _T_E2Z,
    _T_MAT, _T_ALR, _T_ALB, _T_FUZZ, _T_IOR, _T_IDX,
    tri_attr_matrix,
)
from ..ops.rows import HitRecordRows
from ..scene.triangles import TriangleScene
from .hit_pallas_v6 import _PAIRS, _split_limbs, stack_coeff_limbs

DEFAULT_TRI_RAY_BLOCK_MXU = 2048
_N_TERMS_TRI = 6

# Ray-feature rows: 0..2 o, 3..5 d, 6..14 o_i*d_j (i-major), 15 ones.
_NF = 16


# Levi-Civita tensor (a host constant; only DEVICE-array jit constants
# are the axon hazard).
_EPS3 = np.zeros((3, 3, 3), np.float32)
_EPS3[0, 1, 2] = _EPS3[1, 2, 0] = _EPS3[2, 0, 1] = 1.0
_EPS3[0, 2, 1] = _EPS3[1, 0, 2] = _EPS3[2, 1, 0] = -1.0


def _cross(a, b):
    return jnp.stack([a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
                      a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
                      a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]], axis=1)


def tri_coeff_matrices(scene: TriangleScene):
    """Four [T, 16] f32 coefficient matrices (det, u_num, v_num, t_num).

    Inactive/padded triangles get all-zero rows (det = 0 -> invalid).
    Device-side jnp throughout (runs under jit)."""
    v0, e1, e2 = scene.v0, scene.e1, scene.e2
    t = v0.shape[0]
    z3 = jnp.zeros((t, 3), jnp.float32)
    z9 = jnp.zeros((t, 9), jnp.float32)
    z1 = jnp.zeros((t, 1), jnp.float32)

    def tri_outer_coeffs(w):
        """o (x) d coefficients of o . (d x w): c[t, i*3+j] on o_i d_j
        (o.(d x w) = sum_ijk eps[i j k] o_i d_j w_k)."""
        return jnp.einsum("ijk,tk->tij", _EPS3, w).reshape(t, 9)

    m_det = jnp.concatenate([z3, _cross(e2, e1), z9, z1], axis=1)
    m_u = jnp.concatenate([z3, -_cross(e2, v0), tri_outer_coeffs(e2), z1],
                          axis=1)
    # d . (o x e1) = -o . (d x e1) -> negate the outer coefficients.
    m_v = jnp.concatenate([z3, -_cross(v0, e1), -tri_outer_coeffs(e1), z1],
                          axis=1)
    n_geo = _cross(e1, e2)
    m_t = jnp.concatenate(
        [n_geo, z3, z9, -jnp.sum(v0 * n_geo, axis=1, keepdims=True)],
        axis=1)

    act = scene.active[:, None]
    return tuple(jnp.where(act, m, 0.0).astype(jnp.float32)
                 for m in (m_det, m_u, m_v, m_t))


@functools.partial(jax.jit, static_argnames=())
def _tri_coeffs_stacked(scene: TriangleScene):
    """Coefficient build per hit call — re-executed inside every step
    program (unlike the sphere path's once-per-render precompute).  The
    cost is [T, 16] einsums/crosses for T <= a few thousand, ~us-scale
    next to the [T, R] sweep; revisit with a coeffs-carrying scene
    pytree if meshes grow past that."""
    md, mu, mv, mt = tri_coeff_matrices(scene)
    return (tuple(stack_coeff_limbs(m, _N_TERMS_TRI)
                  for m in (md, mu, mv, mt)),
            tri_attr_matrix(scene))


def _tri_kernel_mxu(md_ref, mu_ref, mv_ref, mt_ref, attrs_ref,
                    o_ref, d_ref, t_ref, g_ref, *, n_tris, min_t):
    pairs = _PAIRS[_N_TERMS_TRI]
    o = o_ref[:, :]
    d = d_ref[:, :]
    ones = jnp.ones_like(o[0:1])
    outer = jnp.concatenate([o[i:i + 1] * d for i in range(3)], axis=0)
    feats = jnp.concatenate([o, d, outer, ones], axis=0)   # [16, R] f32
    n_limbs = 1 + max(j for _, j in pairs)
    f_limbs = [l.astype(jnp.float32) for l in _split_limbs(feats, n_limbs)]
    f_stack = jnp.concatenate(
        [f_limbs[j] for _, j in pairs], axis=0).astype(jnp.bfloat16)

    def mm(m_ref):
        return jax.lax.dot_general(
            m_ref[:, :], f_stack,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [T, R]

    det = mm(md_ref)
    u_num = mm(mu_ref)
    v_num = mm(mv_ref)
    t_num = mm(mt_ref)

    ok_det = jnp.abs(det) >= _DET_EPS
    inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
    u = u_num * inv_det
    v = v_num * inv_det
    t = t_num * inv_det
    valid = (ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
             & (t > min_t))
    t = jnp.where(valid, t, F32_MAX)

    t_min = jnp.min(t, axis=0, keepdims=True)              # [1, R]
    eq = t == t_min
    sub = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0).astype(jnp.float32)
    big = jnp.float32(n_tris + 1)
    winner = jnp.min(jnp.where(eq, sub, big), axis=0, keepdims=True)
    onehot = (sub == winner).astype(jnp.float32)

    g_ref[:, :] = jax.lax.dot_general(
        attrs_ref[:, :], onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t_ref[:, :] = t_min


@functools.partial(jax.jit, static_argnames=("min_t", "ray_block",
                                             "interpret"))
def _tri_mxu_raw(md, mu, mv, mt, attrs, o, d, *, min_t, ray_block,
                 interpret=False):
    n = o.shape[1]
    s = attrs.shape[0]
    k = md.shape[1]
    kernel = functools.partial(_tri_kernel_mxu, n_tris=s, min_t=min_t)

    def rowspec(rows):
        return pl.BlockSpec((rows, ray_block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def whole(r, c_):
        return pl.BlockSpec((r, c_), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n // ray_block,),
        in_specs=[whole(s, k)] * 4 + [whole(s, TRI_ATTR_COLS),
                                      rowspec(3), rowspec(3)],
        out_specs=[rowspec(1), rowspec(TRI_ATTR_COLS)],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((TRI_ATTR_COLS, n), jnp.float32),
        ],
        interpret=interpret,
    )(md, mu, mv, mt, attrs, o, d)


def hit_triangles_mxu_rows(
    scene: TriangleScene,
    origin: jnp.ndarray,     # [3, N]
    direction: jnp.ndarray,  # [3, N]
    time: jnp.ndarray,       # [1, N] (unused: meshes are static)
    min_t: float = MIN_HIT_T,
    ray_block: int = DEFAULT_TRI_RAY_BLOCK_MXU,
    interpret: bool = False,
) -> HitRecordRows:
    """Rows-layout nearest two-sided triangle hit via the MXU sweep.

    Brute force: materializes [T, ray_block] intermediates, so VMEM
    (128 MB on v5e) caps the mesh at a few thousand triangles — bigger
    meshes go through the Morton-tile grid (tri_accel.py), which
    dispatch.get_hit_fn_rows_accel selects automatically."""
    del time
    n_tris = scene.padded_size
    if n_tris * ray_block * 4 * 6 > 96 * (1 << 20):
        raise ValueError(
            f"brute MXU triangle sweep at {n_tris} tris x ray_block "
            f"{ray_block} exceeds VMEM; use the grid "
            "(cfg.accel='auto'/tri_accel.build_tri_grid) or shrink "
            "ray_block")
    n = origin.shape[1]
    pad = (-n) % ray_block
    o, d = origin, direction
    if pad:
        o = jnp.pad(o, ((0, 0), (0, pad)))
        d = jnp.pad(d, ((0, 0), (0, pad))).at[2, n:].set(1.0)
    (md, mu, mv, mt), attrs = _tri_coeffs_stacked(scene)
    t_out, g = _tri_mxu_raw(md, mu, mv, mt, attrs, o, d,
                            min_t=float(min_t), ray_block=ray_block,
                            interpret=interpret)

    hit = t_out < F32_MAX
    t_safe = jnp.where(hit, t_out, 0.0)
    point = o + t_safe * d
    e1 = g[_T_E1X:_T_E1Z + 1]
    e2 = g[_T_E2X:_T_E2X + 3]
    gx = e1[1:2] * e2[2:3] - e1[2:3] * e2[1:2]
    gy = e1[2:3] * e2[0:1] - e1[0:1] * e2[2:3]
    gz = e1[0:1] * e2[1:2] - e1[1:2] * e2[0:1]
    norm = jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
    normal = jnp.concatenate([gx, gy, gz], axis=0) / norm
    rec = HitRecordRows(
        hit=hit, t=t_out, point=point, normal=normal,
        idx=g[_T_IDX:_T_IDX + 1].astype(jnp.int32),
        mat_id=g[_T_MAT:_T_MAT + 1].astype(jnp.int32),
        albedo=g[_T_ALR:_T_ALB + 1],
        fuzz=g[_T_FUZZ:_T_FUZZ + 1], ior=g[_T_IOR:_T_IOR + 1],
    )
    if pad:
        rec = HitRecordRows(*(x[:, :n] for x in rec))
    return rec
