# job 990 (anatomy): where does the headline's 1.94 s go?
# Counts every step/compaction dispatch of a real render (stashing the
# first real args per batch size), then times each program chained at
# each observed size.  Model total vs measured render wall splits the
# traced-dims regression (r3 1.81 -> r4 1.94) into bounce / compact /
# padding / host terms.
import collections
import win32_raytracer_tpu.persistent as P
import win32_raytracer_tpu.kernels.bounce_pallas as BP
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render as _render
from win32_raytracer_tpu.scene.builders import random_scene

scene_a = random_scene()
cfg_a = RenderConfig(width=1200, height=800, samples=100, seed=21,
                     rays_per_chunk=1 << 22)

counts = {"fb": collections.Counter(), "multi": collections.Counter(),
          "oneshot": collections.Counter(), "step1": collections.Counter(),
          "compact": collections.Counter(), "split": collections.Counter()}
stash = {}

orig = {"fb": BP.p_bounce_fused_jit, "multi": P.p_bounce_multi_step,
        "oneshot": P.p_render_oneshot, "step1": P.p_bounce_step,
        "compact": P._compact, "split": P._split}

def wrap_state2(name):
    o = orig[name]
    def w(*a, **k):
        n = a[2].pixel.shape[1]
        counts[name][n] += 1
        stash.setdefault((name, n), (a, k))
        return o(*a, **k)
    return w

def wrap_compact(*a, **k):
    key = (a[0].pixel.shape[1], k["k_new"])
    counts["compact"][key] += 1
    stash.setdefault(("compact", key), (a, k))
    return orig["compact"](*a, **k)

def wrap_split(*a, **k):
    n = a[0].pixel.shape[1]
    counts["split"][n] += 1
    stash.setdefault(("split", n), (a, k))
    return orig["split"](*a, **k)

BP.p_bounce_fused_jit = wrap_state2("fb")
P.p_bounce_multi_step = wrap_state2("multi")
P.p_render_oneshot = wrap_state2("oneshot")
P.p_bounce_step = wrap_state2("step1")
P._compact = wrap_compact
P._split = wrap_split
try:
    t0 = time.perf_counter()
    img = _render(scene_a, cfg=cfg_a)
    wall = time.perf_counter() - t0
finally:
    BP.p_bounce_fused_jit = orig["fb"]
    P.p_bounce_multi_step = orig["multi"]
    P.p_render_oneshot = orig["oneshot"]
    P.p_bounce_step = orig["step1"]
    P._compact = orig["compact"]
    P._split = orig["split"]
print(f"instrumented render: {wall:.3f}s mean {float(img.mean()):.2f}",
      flush=True)
for name, c in counts.items():
    print(f"{name}: {dict(sorted(c.items()))}", flush=True)

def block(st):
    jax.block_until_ready(st)

unit = {}
# fused bounce + multi-step: chain st through, vary step arg [4]
for name in ("fb", "multi", "step1"):
    o = orig[name]
    for n, cnt in sorted(counts[name].items()):
        a, k = stash[(name, n)]
        st = a[2]
        reps = 10 if n >= (1 << 20) else 16
        block(st)
        t0 = time.perf_counter()
        for r in range(reps):
            a2 = list(a)
            a2[2] = st
            a2[4] = jnp.int32(1000 + r)
            st = o(*a2, **k)
        block(st)
        dt = (time.perf_counter() - t0) / reps
        unit[(name, n)] = dt
        print(f"unit {name}@{n}: {dt*1e3:.2f} ms", flush=True)
# compact: per-call timing, vary accum arg [1] to defeat relay dedupe
for key, cnt in sorted(counts["compact"].items()):
    a, k = stash[("compact", key)]
    reps = 5
    ts = []
    for r in range(reps):
        a2 = list(a)
        a2[1] = a[1] + jnp.float32(r) * jnp.float32(1e-30)
        block(a2[1])
        t0 = time.perf_counter()
        out = orig["compact"](*a2, **k)
        block(out)
        ts.append(time.perf_counter() - t0)
    unit[("compact", key)] = min(ts)
    print(f"unit compact@{key}: {min(ts)*1e3:.2f} ms", flush=True)
for n, cnt in sorted(counts["split"].items()):
    a, k = stash[("split", n)]
    ts = []
    for r in range(5):
        a2 = list(a)
        st0 = a[0]
        st0 = st0._replace(time=st0.time + jnp.float32(r) * jnp.float32(1e-30))
        a2[0] = st0
        block(st0.time)
        t0 = time.perf_counter()
        out = orig["split"](*a2, **k)
        block(out)
        ts.append(time.perf_counter() - t0)
    unit[("split", n)] = min(ts)
    print(f"unit split@{n}: {min(ts)*1e3:.2f} ms", flush=True)

model = 0.0
by_group = collections.Counter()
for name in ("fb", "multi", "step1", "split"):
    for n, cnt in counts[name].items():
        c = cnt * unit[(name, n)]
        model += c
        by_group[name] += c
for key, cnt in counts["compact"].items():
    c = cnt * unit[("compact", key)]
    model += c
    by_group["compact"] += c
# oneshot runs once; charge measured-by-difference
print(f"model (excl oneshot/host/fetch): {model:.3f}s of {wall:.3f}s "
      f"measured; groups: "
      f"{ {g: round(v, 3) for g, v in by_group.items()} }", flush=True)
# lane-step integrals
tot_steps = sum(n * c for n, c in counts['fb'].items()) + \
    sum(n * c for n, c in counts['multi'].items()) + \
    sum(n * c for n, c in counts['step1'].items())
print(f"dispatched lane-steps (excl oneshot): {tot_steps/1e6:.1f}M; "
      f"ideal ~211M", flush=True)
