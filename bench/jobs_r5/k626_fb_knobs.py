# job k626: fused-bounce kernel knob sweep at the headline's top rung
# (round-5 roofline follow-up: measured 5.62 ns/lane-step vs ~3 ns
# modeled floor -> ~2x Mosaic slack; cheapest probes first).
#   * ray_block 1024 / 2048 (default) / 4096 / 8192
#   * n_terms 6 (default, K=96) vs 3 (K=48 - halves the MXU term at the
#     documented grazing-accuracy stance, hit_pallas_v6.py)
# Stashes one real fb call from an instrumented headline render, then
# unit-times each variant chained (990-style protocol).
t_all = time.perf_counter()
import win32_raytracer_tpu.persistent as P
import win32_raytracer_tpu.kernels.bounce_pallas as BP
import win32_raytracer_tpu.kernels.hit_pallas_v7 as V7
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render as _render
from win32_raytracer_tpu.scene.builders import random_scene

scene_k = random_scene()
cfg_k = RenderConfig(width=1200, height=800, samples=100, seed=31,
                     rays_per_chunk=1 << 22)

stash_k = {}
orig_fb = BP.p_bounce_fused_jit

def wrap_fb(*a, **k):
    n = a[2].pixel.shape[1]
    stash_k.setdefault(n, (a, k))
    return orig_fb(*a, **k)

BP.p_bounce_fused_jit = wrap_fb
try:
    img = _render(scene_k, cfg=cfg_k)
finally:
    BP.p_bounce_fused_jit = orig_fb
print(f"stashed sizes: {sorted(stash_k)}; mean {float(img.mean()):.2f}",
      flush=True)
TOP = max(stash_k)
a0, k0 = stash_k[TOP]

def time_fb(label, a, k, reps=10):
    st = a[2]
    jax.block_until_ready(st)
    # warm/compile
    a2 = list(a)
    a2[2] = st
    a2[4] = jnp.int32(900)
    stw = orig_fb(*a2, **k)
    jax.block_until_ready(stw)
    t0 = time.perf_counter()
    for r in range(reps):
        a2 = list(a)
        a2[2] = st
        a2[4] = jnp.int32(1000 + r)
        st = orig_fb(*a2, **k)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / reps
    print(f"fb[{label}]@{TOP}: {dt*1e3:.2f} ms = "
          f"{dt/TOP*1e9:.2f} ns/lane", flush=True)
    return dt

base = time_fb("rb2048,t6 (prod)", a0, k0)
for rb in (1024, 4096, 8192):
    try:
        time_fb(f"rb{rb},t6", a0, dict(k0, ray_block=rb))
    except Exception as e:
        print(f"rb{rb} failed: {type(e).__name__}: {e}", flush=True)

# n_terms=3 arm: rebuild coeff stacks at K=48 and patch the pair list
orig_terms = V7._N_TERMS
try:
    V7._N_TERMS = 3
    coeffs3 = V7.hit_coeffs(scene_k)
    a3 = list(a0)
    a3[0] = coeffs3
    time_fb("rb2048,t3", tuple(a3), k0)
    for rb in (4096,):
        try:
            time_fb(f"rb{rb},t3", tuple(a3), dict(k0, ray_block=rb))
        except Exception as e:
            print(f"rb{rb},t3 failed: {type(e).__name__}: {e}", flush=True)
finally:
    V7._N_TERMS = orig_terms
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
