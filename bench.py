#!/usr/bin/env python
"""Benchmark: RTIOW final scene, 1200x800 @ 100 spp on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's best multi-threaded AVX CPU figure — 2.50 Mrays/s
primary (640x480x50spp in 6143 ms at 20 threads on an i5-2500K;
BASELINE.md, derived from /root/reference/manualTestResults.txt:16).
"rays" counts primary rays only (W*H*spp), matching BASELINE.md's
conservative convention.

Protocol (docs/axon_runtime_notes.md): flip the axon runtime into honest
sync mode with a tiny fetch BEFORE anything else, warm all programs with a
first render, then time interleaved renders end-to-end (dispatch ->
fetched u8 image).  The headline runs ONE arm — the uniform-lane
persistent scheduler, the measured winner.  Round 2 ran a second
difficulty-adaptive arm here; it LOST every interleaved rep on chip
(BENCH_r02: 2.56/2.91/2.70s vs uniform 2.14/2.42/2.12s; confirmed with
the pooled-estimate variant in tpu_jobs 500) while doubling the warm-up
compile surface, so it is demoted to an opt-in side arm: set
BENCH_ARMS=uniform,adaptive[,adaptive_pool,oneshot_on] to re-run the
A/B (arms still interleave per rule 12).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

BASELINE_MRAYS = 2.50

WIDTH, HEIGHT, SPP = 1200, 800, 100


def _require_axon_relay(window_s: float = 1800.0) -> None:
    """Wait (bounded) for the axon loopback relay when it is configured
    but absent, then abort rather than hang.

    Without this, the first device op retries inside the C++ client for
    ~50 min per compile (docs/axon_runtime_notes.md #20a) — a dead relay
    turns the benchmark into a multi-hour hang.  The wait window is long
    (relay outages last minutes-to-hours and come back on their own;
    aborting early forfeits the round's benchmark, waiting costs only
    idle time), but bounded so the caller always gets an exit.  Only
    applies to the axon platform; direct-TPU environments skip the
    check."""
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return

    # bench.py shadows the bench/ directory as a module name, so pull
    # the shared probe in by path (same module name worker.py uses).
    probe_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench")
    if probe_dir not in sys.path:
        sys.path.insert(0, probe_dir)
    from relay_probe import relay_port_up as up

    deadline = time.monotonic() + window_s
    t0 = time.monotonic()
    while time.monotonic() < deadline:
        if up():
            return
        waited = time.monotonic() - t0
        if waited > 1.0 and int(waited) % 60 < 5:
            print(f"# bench.py: axon relay down, waiting "
                  f"({waited:.0f}s/{window_s:.0f}s)", file=sys.stderr)
        time.sleep(5.0)
    print("bench.py: axon relay listener absent (ports 8080-8220) after "
          f"{window_s:.0f}s; aborting instead of hanging in the C++ "
          "retry loop", file=sys.stderr)
    sys.exit(1)


def _enable_compile_cache():
    """Turn the persistent compilation cache ON at runtime (the env var
    alone is read-too-late under the axon sitecustomize — see the shared
    helper's docstring)."""
    from win32_raytracer_tpu._cache import enable_compile_cache

    enable_compile_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    _require_axon_relay()
    _enable_compile_cache()

    # Flip to sync (honest-timing) mode first; this one fetch is the slow
    # one-per-process channel setup and must not pollute the measurement.
    np.asarray(jnp.ones((8,)) + 1)

    from win32_raytracer_tpu.config import RenderConfig
    from win32_raytracer_tpu.render import render
    from win32_raytracer_tpu.scene.builders import random_scene

    scene = random_scene()
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, samples=SPP, seed=3,
                       rays_per_chunk=1 << 22)
    all_arms = {
        "uniform": cfg,
        "adaptive": cfg.replace(adaptive_alloc="on"),
        "adaptive_pool": cfg.replace(adaptive_alloc="on",
                                     adaptive_pool="on"),
        "oneshot_on": cfg.replace(one_shot="on"),
    }
    arm_names = os.environ.get("BENCH_ARMS", "uniform").split(",")
    arms = {n: all_arms[n] for n in arm_names}

    # Warm-up: compiles every step program (and populates the persistent
    # compilation cache for future runs).  Distinct seed from the timed
    # reps (rule 15: identical reruns hit the relay's dedupe).  Arms are
    # best-effort: a failure first retries the arm with one_shot="off"
    # (the device-side while-loop finisher is the newest compile surface
    # — a Mosaic-in-while failure on the real chip must degrade the arm,
    # not forfeit the benchmark), then drops it.
    def _cache_entries():
        try:
            return len(os.listdir(os.environ["JAX_COMPILATION_CACHE_DIR"]))
        except OSError:
            return 0

    warm_info = {}

    def _warm(name):
        c0 = _cache_entries()
        t0 = time.perf_counter()
        img = render(scene, cfg=arms[name].replace(seed=99))
        m = float(img.mean())
        if not (1.0 <= m <= 254.0):
            raise RuntimeError(f"suspicious warm image mean {m:.2f}")
        c1 = _cache_entries()
        dt = time.perf_counter() - t0
        warm_info[name] = (dt, c1 - c0, c0)
        print(f"# warm-up {name} (incl. compiles): "
              f"{dt:.1f}s, mean {m:.2f}; "
              f"disk compile cache {c0} -> {c1} entries "
              f"({'mostly hits' if c1 - c0 <= 3 else f'{c1 - c0} misses'})",
              file=sys.stderr)

    for name in list(arms):
        try:
            _warm(name)
        except Exception as e:
            print(f"# {name} arm failed to warm ({type(e).__name__}: "
                  f"{e}); retrying with one_shot='off'", file=sys.stderr)
            arms[name] = arms[name].replace(one_shot="off")
            try:
                _warm(name)
            except Exception as e2:
                print(f"# {name} arm failed again ({type(e2).__name__}: "
                      f"{e2}); dropping it", file=sys.stderr)
                del arms[name]

    # Timed runs: full wall-clock to a fetched u8 image, arms interleaved,
    # best of 3 per arm (the relay's throughput drifts within a process,
    # runtime-notes rule 12).  Each rep renders a DIFFERENT seed: the
    # relay dedupes duplicate (program, args) executions, so repeating
    # identical renders reads fiction (rule 15).  Seeds feed only traced
    # salts — no recompiles.
    if not arms:
        raise SystemExit("every benchmark arm failed to warm — see the "
                         "warm-up errors above")
    best = {name: float("inf") for name in arms}
    for rep in range(3):
        for name, acfg in list(arms.items()):
            try:
                t0 = time.perf_counter()
                img = render(scene, cfg=acfg.replace(seed=3 + rep))
                dt_i = time.perf_counter() - t0
            except Exception as e:
                # Same best-effort contract as warm-up: a mid-run arm
                # failure drops the arm, never the benchmark (unless it
                # was the last arm with no finite time yet).
                print(f"# {name} arm failed at rep {rep} "
                      f"({type(e).__name__}: {e}); dropping it",
                      file=sys.stderr)
                del arms[name]
                if best[name] == float("inf"):
                    del best[name]
                if not best:
                    raise
                continue
            print(f"# timed {name}[{rep}] seed={3 + rep}: {dt_i:.2f}s, "
                  f"image mean {img.mean():.2f}", file=sys.stderr)
            best[name] = min(best[name], dt_i)

    winner = min(best, key=best.get)
    dt = best[winner]
    print(f"# arm bests: " + ", ".join(
        f"{n}={t:.2f}s" for n, t in best.items())
        + f" -> headline arm: {winner}", file=sys.stderr)

    rays = WIDTH * HEIGHT * SPP
    mrays = rays / dt / 1e6

    out_path = os.path.join(os.path.dirname(__file__), "bench_out.png")
    try:
        from win32_raytracer_tpu.io.image import write_image
        write_image(out_path, img)
    except Exception:
        pass

    # Warm-up reporting (verdict r4 item 7): the measured number is a
    # disk-cache-hit warm-up whenever the repo's .jax_cache already holds
    # this program set; the cold figure (empty cache, every program
    # remote-compiled) is measured separately and recorded here so the
    # two are never conflated.  Cold reference: tpu_jobs 614/615 measured
    # 358 s for the headline set alone / 2137 s for the full suite set on
    # a wiped cache; re-measured round 5 in tpu_jobs m628.
    wdt, wmiss, _ = warm_info.get(winner, (float("nan"), -1, 0))
    print(json.dumps({
        "metric": "Mrays/sec primary, 1200x800@100spp RTIOW final scene, "
                  "1 chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "warmup_s": round(wdt, 1),
        "warmup_cache_misses": wmiss,
        "warmup_kind": ("cache-hit" if wmiss <= 32 else "cold-or-partial"),
        "warmup_cold_s_recorded": 358.0,
        "warmup_cold_source": "tpu_jobs 614 (headline program set, wiped "
                              "cache); full-suite cold 2137 s (tpu_jobs "
                              "615)",
    }))


if __name__ == "__main__":
    main()
