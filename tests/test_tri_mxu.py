"""MXU Möller-Trumbore triangle kernel vs the jnp oracle (interpret)."""

import numpy as np

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.kernels.tri_pallas_mxu import (
    hit_triangles_mxu_rows, tri_coeff_matrices,
)
from win32_raytracer_tpu.ops.hit_tri import hit_triangles
from win32_raytracer_tpu.ops.rows import hit_rows_adapter
from win32_raytracer_tpu.scene.builders import mesh_scene

INTERPRET = jax.devices()[0].platform == "cpu"
RB = 256


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-4, 4, (3, n)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (3, n)), jnp.float32)
    t = jnp.zeros((1, n), jnp.float32)
    return o, d, t


def test_tri_coeff_factorization_exact():
    """det/u/v/t from the coefficient matrices match the direct MT
    computation in f32 (the factorization itself, no bf16)."""
    tris = mesh_scene().triangles
    md, mu, mv, mt = tri_coeff_matrices(tris)
    o, d, _ = _rays(64)
    outer = jnp.concatenate([o[i:i + 1] * d for i in range(3)], axis=0)
    feats = jnp.concatenate([o, d, outer, jnp.ones_like(o[0:1])], axis=0)

    def mm(m):
        return jnp.einsum("tk,kr->tr", m.astype(jnp.float64),
                          feats.astype(jnp.float64))

    act = np.asarray(tris.active)
    v0 = np.asarray(tris.v0, np.float64)
    e1 = np.asarray(tris.e1, np.float64)
    e2 = np.asarray(tris.e2, np.float64)
    on = np.asarray(o, np.float64).T
    dn = np.asarray(d, np.float64).T
    p = np.cross(dn[None, :], e2[:, None])          # [T, R, 3]
    det_ref = np.einsum("tj,trj->tr", e1, p)
    s = on[None, :] - v0[:, None]
    u_ref = np.einsum("trj,trj->tr", s, p)
    q = np.cross(s, e1[:, None])
    v_ref = np.einsum("rj,trj->tr", dn, q)
    t_ref = np.einsum("tj,trj->tr", e2, q)
    for name, m, ref in (("det", md, det_ref), ("u", mu, u_ref),
                         ("v", mv, v_ref), ("t", mt, t_ref)):
        got = np.asarray(mm(m))
        np.testing.assert_allclose(got[act], ref[act], rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_tri_mxu_vs_oracle():
    tris = mesh_scene().triangles
    o, d, t = _rays(2048, seed=3)
    oracle = hit_rows_adapter(hit_triangles)(tris, o, d, t)
    rec = hit_triangles_mxu_rows(tris, o, d, t, ray_block=RB,
                                 interpret=INTERPRET)
    h0 = np.asarray(oracle.hit[0])
    h1 = np.asarray(rec.hit[0])
    assert (h0 != h1).mean() < 2e-3, (h0 != h1).mean()
    both = h0 & h1
    same = both & (np.asarray(oracle.idx[0]) == np.asarray(rec.idx[0]))
    assert same.sum() > 0.99 * both.sum()
    rel = np.abs(np.asarray(rec.t[0])[same]
                 - np.asarray(oracle.t[0])[same]) \
        / np.maximum(np.asarray(oracle.t[0])[same], 1e-3)
    assert np.percentile(rel, 99) < 1e-3, np.percentile(rel, 99)
    np.testing.assert_array_equal(np.asarray(oracle.mat_id[0])[same],
                                  np.asarray(rec.mat_id[0])[same])
    # Normals unit and matching the oracle up to sign conventions (both
    # use cross(e1, e2) so they must match exactly where winners agree).
    np.testing.assert_allclose(np.asarray(rec.normal)[:, same],
                               np.asarray(oracle.normal)[:, same],
                               rtol=1e-4, atol=1e-4)


def test_composite_rows_render_smoke():
    """Composite mesh scene renders through the persistent scheduler
    with the rows-native hit path (CPU: jnp fallback; structure only)."""
    from win32_raytracer_tpu.persistent import render_image_persistent
    from win32_raytracer_tpu.scene.camera import default_camera

    scene = mesh_scene()
    cfg = RenderConfig(width=64, height=32, samples=4, backend="jnp")
    cam = default_camera(64, 32)
    img = np.asarray(render_image_persistent(scene, cam, cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
