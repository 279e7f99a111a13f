"""v6 hit kernel (MXU split-bf16 quadratic) vs the jnp oracle.

v6 trades exactness for speed: bf16 limb products on the MXU reconstruct
~f32 precision at n_terms=6 (see kernels/hit_pallas_v6.py).  These tests
pin (a) the limb decomposition itself — which must survive XLA's
excess-precision elision (the bug class that silently zeroed limbs under
--xla_allow_excess_precision) — and (b) the end-to-end flip rates vs the
exact oracle staying at the measured ~1e-4 level.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.kernels.hit_pallas_v6 import (
    _PAIRS, _split_limbs, hit_spheres_pallas_v6, stack_coeff_limbs,
)
from win32_raytracer_tpu.ops.hit import hit_spheres
from win32_raytracer_tpu.ops.rows import hit_rows_adapter
from win32_raytracer_tpu.scene.builders import random_scene

INTERPRET = jax.devices()[0].platform == "cpu"


def test_split_limbs_reconstruction():
    """3 bf16 limbs reconstruct f32 exactly — including under jit, where
    a naive f32->bf16->f32 round-trip is elided as identity when XLA
    allows excess precision."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([
        rng.uniform(-2000, 2000, 4096), [0.0, 1e6, -1e6, 1e-8, 1e18],
    ]).astype(np.float32))

    @jax.jit
    def recon(x):
        limbs = _split_limbs(x, 3)
        return sum(l.astype(jnp.float32) for l in limbs)

    r = np.asarray(recon(x))
    xf = np.asarray(x)
    small = np.abs(xf) < 1e12   # beyond that, f32 ulp > bf16 limb 3 depth
    np.testing.assert_array_equal(r[small], xf[small])
    # Two limbs already reach ~2^-16 relative.
    @jax.jit
    def recon2(x):
        limbs = _split_limbs(x, 2)
        return sum(l.astype(jnp.float32) for l in limbs)
    err = np.abs(np.asarray(recon2(x)) - xf)
    assert (err[small] <= np.abs(xf[small]) * 2.0 ** -15 + 1e-30).all()


def test_stack_coeff_limbs_shape():
    m = jnp.asarray(np.random.default_rng(1).uniform(
        -10, 10, (32, 16)).astype(np.float32))
    for nt, pairs in _PAIRS.items():
        s = stack_coeff_limbs(m, nt)
        assert s.shape == (32, 16 * len(pairs))
        assert s.dtype == jnp.bfloat16


@pytest.mark.parametrize("n_terms,max_flip", [(6, 2e-3)])
def test_v6_vs_oracle(n_terms, max_flip):
    """End-to-end winner agreement with the exact jnp sweep on random
    rays against the RTIOW scene (the dynamic-range stress: ground-sphere
    coefficients reach 1e6)."""
    scene = random_scene()
    rng = np.random.default_rng(0)
    n = 4096
    o = jnp.asarray(rng.uniform(-12, 12, (3, n)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (3, n)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 0.05, (1, n)).astype(np.float32))

    oracle = hit_rows_adapter(hit_spheres)(scene, o, d, t)
    r6 = hit_spheres_pallas_v6(scene, o, d, t, ray_block=2048,
                               n_terms=n_terms, interpret=INTERPRET)
    h0 = np.asarray(oracle.hit[0])
    h6 = np.asarray(r6.hit[0])
    assert (h0 != h6).mean() < max_flip
    both = h0 & h6
    flips = (np.asarray(oracle.idx[0])[both]
             != np.asarray(r6.idx[0])[both])
    assert flips.mean() < max_flip
    same = both.copy()
    same[both] &= ~flips
    t0 = np.asarray(oracle.t[0])[same]
    t6 = np.asarray(r6.t[0])[same]
    rel = np.abs(t6 - t0) / np.maximum(np.abs(t0), 1e-3)
    assert np.percentile(rel, 99) < 1e-3, np.percentile(rel, 99)
    # Attributes follow the winner exactly (one-hot gather).
    np.testing.assert_array_equal(np.asarray(oracle.mat_id[0])[same],
                                  np.asarray(r6.mat_id[0])[same])
