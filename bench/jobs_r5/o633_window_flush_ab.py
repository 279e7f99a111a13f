# job o633: windowed-MXU flush vs scatter flush, headline config,
# interleaved (tpu_jobs i623: the dropped-tail segment_sum is ~155 ms of
# the 149 ms top-rung compact* — *sync-biased unit timings; the flush
# dominates).  Also exercises the round-5 two-program compact split
# (sort-by-width + finish-by-pair) in both arms, and unit-times the new
# flush at the top tail shape.
# Requires a worker started after the window-flush commit.
t_all = time.perf_counter()
import win32_raytracer_tpu.persistent as P
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render as _render
from win32_raytracer_tpu.scene.builders import random_scene

assert hasattr(P, "_window_flush"), "stale worker"
scene_o = random_scene()
cfg_o = RenderConfig(width=1200, height=800, samples=100, seed=61,
                     rays_per_chunk=1 << 22)

# unit: window flush vs segsum at the top tail shape (sorted pixels)
T, NPIX = 1572864, 983040
rng = np.random.RandomState(8)
pix_u = jnp.asarray(np.sort(rng.randint(0, NPIX, T)).astype(np.int32))
rad_u = jnp.asarray(rng.rand(3, T).astype(np.float32))
acc_u = jnp.zeros((3, NPIX), jnp.float32)

import functools
@jax.jit
def win_flush(a, p, r):
    return P._window_flush(a, p, r)

@jax.jit
def scat_flush(a, p, r):
    return a + jax.ops.segment_sum(r.T, p, num_segments=NPIX,
                                   indices_are_sorted=True).T

for name, fn in (("window", win_flush), ("scatter", scat_flush)):
    out = fn(acc_u, pix_u, rad_u)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(acc_u, pix_u, rad_u))
        best = min(best, time.perf_counter() - t0)
    print(f"unit flush {name}@{T}: {best*1e3:.1f} ms", flush=True)
ok = np.allclose(np.asarray(win_flush(acc_u, pix_u, rad_u)),
                 np.asarray(scat_flush(acc_u, pix_u, rad_u)),
                 rtol=2e-5, atol=2e-5)
print(f"unit flush agreement: {ok}", flush=True)
assert ok

# end-to-end interleaved A/B at shipped defaults vs flush_mode=window
def run(flush, seed):
    return _render(scene_o, cfg=cfg_o.replace(flush_mode=flush,
                                              seed=seed))

for name in ("scatter", "window"):
    t0 = time.perf_counter()
    img = run(name, 61)
    print(f"warm {name}: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img.mean()):.2f}", flush=True)

best = {"scatter": float("inf"), "window": float("inf")}
for rep in range(4):
    for name in ("scatter", "window"):
        t0 = time.perf_counter()
        run(name, 3 + rep)
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)
rays = 1200 * 800 * 100 / 1e6
print(f"o633 best scatter {best['scatter']:.3f}s = "
      f"{rays/best['scatter']:.2f}; window {best['window']:.3f}s = "
      f"{rays/best['window']:.2f} Mrays/s "
      f"({(best['scatter']/best['window']-1)*100:+.1f}% window win)",
      flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
