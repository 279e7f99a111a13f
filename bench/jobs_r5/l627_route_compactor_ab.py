# job l627: router compactor vs sort compactor, headline config,
# interleaved (round-5: compaction is 0.33-0.53 s of the 1.9 s wall;
# _compact_route_core replaces the 20-operand sort network with
# ~22 masked-shift passes).  Also times the route program vs the sort
# program head-to-head at the top rung, and records compile walls for
# the route programs (the sort pairs take minutes each — the route
# engine should kill that tail too, verdict item 8).
t_all = time.perf_counter()
import win32_raytracer_tpu.persistent as P
import win32_raytracer_tpu.config as C
from win32_raytracer_tpu.render import render as _render
# NOTE: requires a worker started AFTER the round-5 compactor landed
assert hasattr(P, "_compact_route"), "stale worker: restart bench/worker.py"
from win32_raytracer_tpu.scene.builders import random_scene

RenderConfig = C.RenderConfig
scene_l = random_scene()
cfg_l = RenderConfig(width=1200, height=800, samples=100, seed=41,
                     rays_per_chunk=1 << 22)

# -- unit A/B at the production top pair (stash real args) ------------
stash_c = {}
orig_c = P._compact

def wrap_c(*a, **k):
    stash_c.setdefault((a[0].pixel.shape[1], k["k_new"]), (a, k))
    return orig_c(*a, **k)

P._compact = wrap_c
try:
    t0 = time.perf_counter()
    img = _render(scene_l, cfg=cfg_l)
    print(f"warm sort-arm: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img.mean()):.2f}; pairs {sorted(stash_c)}", flush=True)
finally:
    P._compact = orig_c

for key in sorted(stash_c, reverse=True)[:3]:
    a, k = stash_c[key]
    kpp_tr = k.get("lanes_per_pixel", 1)
    t0 = time.perf_counter()
    out = P._compact_route(a[0], a[1], k_new=k["k_new"],
                           lanes_per_pixel=kpp_tr)
    jax.block_until_ready(out)
    print(f"route compile+run @{key}: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for name, fn in (
            ("sort", lambda r: orig_c(
                a[0]._replace(time=a[0].time + jnp.float32(r) * 1e-30),
                a[1], **k)),
            ("route", lambda r: P._compact_route(
                a[0]._replace(time=a[0].time + jnp.float32(r) * 1e-30),
                a[1], k_new=k["k_new"], lanes_per_pixel=kpp_tr))):
        ts = []
        for r in range(5):
            st_in = a[0]._replace(time=a[0].time + jnp.float32(r) * 1e-30)
            jax.block_until_ready(st_in.time)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(r))
            ts.append(time.perf_counter() - t0)
        print(f"unit {name}@{key}: {min(ts)*1e3:.1f} ms", flush=True)

# -- end-to-end interleaved A/B --------------------------------------
def run(compactor, seed):
    return _render(scene_l, cfg=cfg_l.replace(compactor=compactor,
                                              seed=seed))

t0 = time.perf_counter()
img_r = run("route", 41)
print(f"warm route-arm: {time.perf_counter()-t0:.1f}s mean "
      f"{float(img_r.mean()):.2f}", flush=True)

best = {"sort": float("inf"), "route": float("inf")}
for rep in range(4):
    for name in ("sort", "route"):
        t0 = time.perf_counter()
        run(name, 3 + rep)
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)
rays = 1200 * 800 * 100 / 1e6
print(f"l627 best sort {best['sort']:.3f}s = {rays/best['sort']:.2f} "
      f"Mrays/s; route {best['route']:.3f}s = {rays/best['route']:.2f} "
      f"Mrays/s ({(best['sort']/best['route']-1)*100:+.1f}% route win)",
      flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
