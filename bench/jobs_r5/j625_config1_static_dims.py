# job j625: config 1 (400x200@16 test scene, shipped defaults) —
# traced-dims vs STATIC-dims one-shot program, interleaved (verdict r4
# item 5: isolate the residual -13% vs round 3's 13.7 Mrays/s).
# Arm T: production (dims = traced i32[8] operand, reciprocal divmod).
# Arm S: same render with the whole-chunk one-shot re-jitted with dims
#   STATIC (np.int32 tuple) and _exact_divmod_any short-circuited to
#   XLA's constant `//` (strength-reduced) — isolating the whole
#   traced-dims tax on the one-program render.  Bit-identical images.
t_all = time.perf_counter()
import functools
import win32_raytracer_tpu.persistent as P
from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render
from win32_raytracer_tpu.scene.builders import get_scene

scene1 = get_scene("test")
cfg1 = RenderConfig(width=400, height=200, samples=16, max_depth=8,
                    seed=99)
rays1 = 400 * 200 * 16 / 1e6

orig_oneshot = P.p_render_oneshot
orig_divmod = P._exact_divmod_any
orig_make_dims = P.make_dims

raw_oneshot = orig_oneshot.__wrapped__
static_oneshot = functools.partial(
    jax.jit,
    static_argnames=("cfg", "hit_fn", "n_frames", "lean", "dims"))(
        raw_oneshot)


def np_make_dims(cfg, width, height, spp, lanes_per_pixel=1):
    kpp = lanes_per_pixel
    kpp_shift = kpp.bit_length() - 1 if kpp & (kpp - 1) == 0 else -1
    if cfg.stratify and spp > 1:
        kx, ky = P._stratify_grid(spp)
    else:
        kx, ky = 1, 1
    rr_start = (cfg.rr_start_depth if cfg.russian_roulette
                else cfg.max_depth + 2)
    return np.asarray([width, height, kpp, kpp_shift, kx, ky,
                       cfg.max_depth, rr_start], np.int32)


def static_divmod(x, d):
    if isinstance(d, (int, np.integer)):
        return x // int(d), x % int(d)
    return orig_divmod(x, d)


def patched_oneshot(scene, cam, st, salt, step0, dims, max_steps, **kw):
    dims_t = tuple(np.int32(v) for v in np.asarray(dims))
    return static_oneshot(scene, cam, st, salt, step0, dims_t,
                          max_steps, **kw)


def run_T(seed):
    return render(scene1, cfg=cfg1.replace(seed=seed))


def run_S(seed):
    P.p_render_oneshot = patched_oneshot
    P._exact_divmod_any = static_divmod
    P.make_dims = np_make_dims
    try:
        return render(scene1, cfg=cfg1.replace(seed=seed))
    finally:
        P.p_render_oneshot = orig_oneshot
        P._exact_divmod_any = orig_divmod
        P.make_dims = orig_make_dims


try:
    # warm both arms (arm S pays its one-time static-program compile)
    t0 = time.perf_counter()
    img_t = run_T(99)
    print(f"warm T: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img_t.mean()):.3f}", flush=True)
    t0 = time.perf_counter()
    img_s = run_S(99)
    print(f"warm S: {time.perf_counter()-t0:.1f}s mean "
          f"{float(img_s.mean()):.3f}", flush=True)
    same = np.array_equal(np.asarray(img_t), np.asarray(img_s))
    print(f"arms bit-identical: {same}", flush=True)
    assert same, "static-dims arm must be bit-identical"

    best = {"T": float("inf"), "S": float("inf")}
    for rep in range(5):
        for name, fn in (("T", run_T), ("S", run_S)):
            t0 = time.perf_counter()
            fn(3 + rep)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name}: {dt*1e3:.1f} ms", flush=True)
    print(f"j625 best T {best['T']*1e3:.1f} ms = {rays1/best['T']:.2f} "
          f"Mrays/s; S {best['S']*1e3:.1f} ms = {rays1/best['S']:.2f} "
          f"Mrays/s; static-dims tax "
          f"{(best['T']/best['S']-1)*100:+.1f}%", flush=True)
finally:
    P.p_render_oneshot = orig_oneshot
    P._exact_divmod_any = orig_divmod
    P.make_dims = orig_make_dims
print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)
