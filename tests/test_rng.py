"""RNG tests: exact reproduction of the reference SSE LCG + sampler stats."""

import os
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from win32_raytracer_tpu.core import rng

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


# First 4 rand_sse vectors for seed 666, captured from native/lcg_check.cpp
# (real SSE2 intrinsics reproducing RayTracer.cpp:31-66).
GOLDEN_666 = np.array(
    [
        [5.338250995e-01, 5.051192641e-01, 5.364343524e-01, 5.107101798e-01],
        [5.109041929e-01, 6.031678915e-01, 9.275606871e-01, 2.427437603e-01],
        [1.386829019e-01, 1.394584775e-01, 4.757267237e-02, 6.865477562e-02],
        [9.442656040e-01, 2.773143947e-01, 1.733305454e-01, 9.170992970e-01],
    ],
    dtype=np.float32,
)


def test_lcg_matches_sse_golden():
    lcg = rng.ReferenceLcg(666)
    got = lcg.stream(4)
    np.testing.assert_array_equal(got, GOLDEN_666)


def test_lcg_range_and_determinism():
    lcg = rng.ReferenceLcg(123)
    s = lcg.stream(1000)
    assert np.all(s >= 0.0) and np.all(s < 1.0)
    lcg2 = rng.ReferenceLcg(123)
    np.testing.assert_array_equal(s, lcg2.stream(1000))


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE_DIR, "lcg_check.cpp")),
    reason="native sources missing",
)
def test_lcg_matches_intrinsics_binary():
    """Cross-check longer streams against the compiled SSE2 oracle."""
    exe = os.path.join(NATIVE_DIR, "lcg_check")
    if not os.path.exists(exe):
        try:
            subprocess.run(
                ["g++", "-O2", "-msse2", "-o", exe,
                 os.path.join(NATIVE_DIR, "lcg_check.cpp")],
                check=True, capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            pytest.skip("no C++ toolchain")
    for seed in (666, 1, 987654321):
        out = subprocess.run(
            [exe, str(seed), "64"], capture_output=True, text=True, check=True
        ).stdout
        want = np.array([[float(v) for v in ln.split()]
                         for ln in out.strip().splitlines()], np.float32)
        got = rng.ReferenceLcg(seed).stream(64)
        np.testing.assert_array_equal(got, want)


def test_lcg_jnp_matches_host():
    state = jnp.asarray(np.stack([rng.lcg_init_state(s) for s in (666, 5)]))
    host = [rng.ReferenceLcg(666), rng.ReferenceLcg(5)]
    for _ in range(16):
        state = rng.lcg_step_jnp(state)
        got = np.asarray(rng.lcg_floats_jnp(state))
        want = np.stack([h.rand4() for h in host])
        np.testing.assert_array_equal(got, want)


def test_unit_ball_sampler():
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (20000, 3))
    p = np.asarray(rng.sample_unit_ball(u))
    r = np.linalg.norm(p, axis=-1)
    assert np.all(r <= 1.0 + 1e-6)
    # Uniform in ball: E[r] = 3/4, mean position ~ 0.
    assert abs(r.mean() - 0.75) < 0.01
    assert np.all(np.abs(p.mean(axis=0)) < 0.02)


def test_unit_disc_sampler():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (20000, 2))
    p = np.asarray(rng.sample_unit_disc(u))
    assert np.all(p[:, 2] == 0.0)
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert np.all(r <= 1.0 + 1e-6)
    # Uniform on disc: E[r] = 2/3.
    assert abs(r.mean() - 2.0 / 3.0) < 0.01
    assert np.all(np.abs(p[:, :2].mean(axis=0)) < 0.02)


def test_hash_uniform01_distribution():
    """Counter-hash draws: range, mean/var, stream decorrelation."""
    import jax.numpy as jnp
    import numpy as np
    from win32_raytracer_tpu.core.rng import hash_uniform01

    salt = np.uint32(0xABCD1234)
    u = np.asarray(hash_uniform01((5, 1 << 16), salt, jnp.int32(7), 0x111))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 3e-3
    assert abs(u.var() - 1 / 12) < 2e-3
    # Different purposes / steps / salts give decorrelated streams.
    v = np.asarray(hash_uniform01((5, 1 << 16), salt, jnp.int32(7), 0x222))
    w = np.asarray(hash_uniform01((5, 1 << 16), salt, jnp.int32(8), 0x111))
    x = np.asarray(hash_uniform01((5, 1 << 16), np.uint32(1), jnp.int32(7),
                                  0x111))
    for other in (v, w, x):
        corr = np.corrcoef(u.ravel(), other.ravel())[0, 1]
        assert abs(corr) < 5e-3, corr
    # Same args are deterministic.
    np.testing.assert_array_equal(
        u, np.asarray(hash_uniform01((5, 1 << 16), salt, jnp.int32(7), 0x111)))


def test_hash_uniform01_adjacent_lane_independence():
    """Adjacent lanes (consecutive counters) must not be correlated —
    the property rejection-free samplers rely on."""
    import jax.numpy as jnp
    import numpy as np
    from win32_raytracer_tpu.core.rng import hash_uniform01

    u = np.asarray(hash_uniform01((1, 1 << 17), np.uint32(99), jnp.int32(3),
                                  0x5CA77E12))[0]
    corr = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(corr) < 5e-3, corr
    # Serial pairs fill the unit square uniformly (coarse chi-square).
    hist, _, _ = np.histogram2d(u[:-1], u[1:], bins=8)
    expect = (len(u) - 1) / 64
    chi2 = ((hist - expect) ** 2 / expect).sum()
    assert chi2 < 150, chi2  # 63 dof; 150 is a generous bound
