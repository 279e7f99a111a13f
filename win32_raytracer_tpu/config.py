"""Render configuration.

Replaces the reference's compile-time constants + mutable globals
(win32-raytracer/pch.h:170-181, set once from the CLI in Main.cpp:73-119)
with an immutable dataclass.  Scene and camera — hard-coded in the reference
(RayTracer.cpp:906-915, 969) — are promoted to first-class arguments of the
render API instead of living here.
"""

from __future__ import annotations

import dataclasses

# Reference defaults (pch.h:170-174).
DEFAULT_IMAGE_WIDTH = 640
DEFAULT_IMAGE_HEIGHT = 480
DEFAULT_NUM_SAMPLES = 50
MAX_RECURSION = 10
DEFAULT_IMAGE_FILENAME = "out.bmp"  # pch.h:183

# Numerical constants of the tracer core.
EPSILON = 1e-5          # normal offset, RayTracer.cpp:13
MIN_HIT_T = 0.001       # near-t threshold, RayTracer.cpp:430
REFLECT_THRES = 0.05    # dielectric reflect bias, RayTracer.cpp:661
SHUTTER_OPEN_T = 0.0    # camera defaults, RayTracer.cpp:233-234
SHUTTER_CLOSE_T = 0.05


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (trace-time) renderer parameters.

    ``match_reference`` toggles reproduction of the reference's numerical
    quirks; production mode uses the textbook formulas:

    * ``refract_discriminant_bias``: the reference computes the refraction
      discriminant as ``2.0 - n^2 (1 - dt^2)`` instead of the textbook
      ``1.0 - ...`` (RayTracer.cpp:168) — this visibly changes the glass.
    * ``schlick_uses_ni_over_nt``: Schlick is called with ``ni_over_nt``
      rather than the material IOR (RayTracer.cpp:658).
    * ``reflect_thres``: the reflect decision is
      ``0.05 + r < probability`` (RayTracer.cpp:661-662), biasing away from
      reflection.  Set >= 1.05 to make dielectrics deterministic refractors
      (used by exact golden tests).
    """

    width: int = DEFAULT_IMAGE_WIDTH
    height: int = DEFAULT_IMAGE_HEIGHT
    samples: int = DEFAULT_NUM_SAMPLES
    max_depth: int = MAX_RECURSION  # depth > max_depth returns black (RayTracer.cpp:399-402)
    seed: int = 0

    # Quirk toggles (all default to reference behavior for image parity).
    refract_discriminant_bias: float = 2.0
    schlick_uses_ni_over_nt: bool = True
    reflect_thres: float = REFLECT_THRES

    # Numerics.
    epsilon: float = EPSILON
    min_hit_t: float = MIN_HIT_T

    # Deterministic mode: every uniform draw becomes 0.5 (pixel centers, no
    # lens/time jitter, fixed dielectric decision).  With specular-only
    # scenes this makes renders exactly comparable against the native oracle
    # (tests/test_golden.py); mirrors oracle `deterministic`.
    deterministic: bool = False

    # Optional Russian-roulette path termination (extension; the reference
    # terminates only on miss / metal absorb / depth, SURVEY.md §7).
    russian_roulette: bool = False
    rr_start_depth: int = 3

    # Execution knobs.
    backend: str = "auto"       # "auto" | "pallas" | "jnp"
    # Scatter+respawn step backend for the persistent scheduler: the
    # fused Pallas kernel (kernels/scatter_pallas.py) vs the XLA row-math
    # program (persistent.p_scatter_respawn_step).  The two are
    # draw-bit-identical; "auto" follows the measured winner per platform.
    scatter_backend: str = "auto"  # "auto" | "pallas" | "jnp"
    # Pallas sphere-sweep kernel for the persistent scheduler's rows path:
    # "v7" (= "auto" on TPU) runs the whole hit+sky phase as one pallas
    # program built on v6's MXU split-bf16 quadratic (hit_pallas_v7.py);
    # "v6" = the quadratic kernel with XLA assembly around it; "v4" = the
    # exact VPU pair sweep (winner flips vs v6/v7 ~2e-4, the f32-MXU
    # level).
    hit_kernel: str = "auto"    # "auto" | "v4" | "v6" | "v7"
    # Fuse the whole bounce (hit+sky+scatter+respawn) into ONE Mosaic
    # kernel program (kernels/bounce_pallas.py): every state row crosses
    # HBM once per bounce instead of twice and the hit record never
    # materializes.  "auto" follows the measured winner per platform.
    fuse_bounce: str = "auto"   # "auto" | "on" | "off"
    # Acceleration structure for the sphere sweep.  "grid" forces the
    # uniform (x, z) footprint-mask grid (accel.py + kernels/hit_grid*.py)
    # — a measured win only for coherent ray batches (primary-dominated
    # work); "auto" currently resolves to the brute sweep for the
    # persistent scheduler because post-compaction bounce batches union to
    # near-all tiles per block (bench/mask_stats.py measurements); "off"
    # forces brute (the reference's behavior, RayTracer.cpp:433-551).
    accel: str = "auto"         # "auto" | "grid" | "off"
    # Per-bounce spatial sort of the path state (persistent scheduler)
    # so block-schedule accel structures keep tight per-block tile
    # unions on bounce batches (persistent._bin_sort).  "auto" = on for
    # scenes carrying a TriGridScene; "on" errors without one; "off"
    # disables (A/B knob).  Permutes lanes like compaction does: images
    # match unbinned renders statistically, not bitwise.
    ray_binning: str = "auto"   # "auto" | "on" | "off"
    # Work redistribution at above-floor compactions: overshoot the
    # compacted size so spare dead lanes adopt donors' unstarted samples
    # (halved sequential tails for hard pixels).  Measured a ~10% LOSS on
    # the headline config (job 245: 2.17 s vs 2.43 s median — the bigger
    # post-compaction batches cost more than the shorter tail saves), so
    # "auto" = off everywhere; "on" is the A/B knob.
    redistribute: str = "auto"  # "auto" | "on" | "off"
    # Triangle-grid tile granularity (triangles per Morton tile).  Fewer,
    # fatter tiles = fewer in-kernel schedule iterations and larger
    # [4*St, K] MXU contractions per scheduled tile, at the cost of
    # coarser culling.  0 = auto (tri_accel.build_tri_grid's default).
    tri_tile_rows: int = 0
    # Triangle-grid ray-block granularity (lanes per scheduled block).
    # Smaller blocks = tighter conservative AABB unions (fewer scheduled
    # tiles per block, especially after ray binning packs blocks into
    # spatial wedges), at the cost of thinner per-tile MXU contractions
    # and more schedule rows.  0 = auto (kernel default).
    tri_ray_block: int = 0
    # Triangle-grid front-to-back early exit: each block's schedule is
    # sorted by a conservative tile entry bound and the in-kernel sweep
    # stops once every lane's min(best t, segment end) is nearer than the
    # next tile's bound (kernels/tri_grid_rows._sweep_scheduled) — exact
    # by construction.  "off" sweeps the full masked schedule (A/B arm).
    tri_early_exit: str = "auto"  # "auto" | "on" | "off"
    # Triangle-grid in-kernel any-touch skip: each scheduled tile's MXU
    # contraction is gated by an exact per-lane slab test of the capped
    # segment [min_t, min(cap, current best t)] against the tile AABB
    # (pl.when, kernels/tri_grid_rows._any_touch).  The host-side block
    # mask is doubly conservative (per-ray segment box -> block union
    # box), so most visited tiles are exactly-untouched: the offline
    # model (tri_knob_sim --anyskip) prices the skip at 1.77x static /
    # 3.16x progressive fewer contractions at prod knobs, block count
    # UNCHANGED.  On chip: +21% end-to-end at the config-4 shape
    # (mesh20k 800x450@50: 1.82 vs 2.21 s every interleaved rep,
    # tpu_jobs 547).  Exact: a tile no lane's segment-to-current-best
    # touches cannot improve any winner.  "off" = the A/B arm.
    tri_any_skip: str = "auto"  # "auto" | "on" | "off"
    # Sub-block granularity of the any-touch gate: the slab test (and
    # the gated contraction+merge) runs per RB/q-lane sub-group instead
    # of per whole ray block.  Lanes are chord-key sorted, so sub-groups
    # are spatially coherent and a tile touched only by one corner of
    # the block skips the other sub-groups' MACs.  The win depends on
    # tile HEIGHT: at St=64 the extra pl.when branch per (tile,
    # sub-group) costs ~what one gated sub-contraction saves (tpu_jobs
    # 578: q2 wash, q4 -14%, q16 -2.1x), but at the St=128 default each
    # gated sub-contraction saves 2x the MACs per constant branch and
    # q=2 crosses into profit: +6% end-to-end at the config-4 shape,
    # every interleaved rep (tpu_jobs 593c: 1.60-1.62 s vs 1.70).
    # 0 = auto (q=2 when tri_any_skip is active, effective tile_rows
    # >= 128, and ray_block % 256 == 0 — kernels/dispatch.py; else the
    # whole-block gate).  Explicit q needs ray_block % (128*q) == 0.
    tri_sub_gate: int = 0
    # Triangle-grid winner-attribute gather.  "fused": each swept tile
    # merges the winner's 17 attribute rows in-kernel via a [17, St] x
    # [St, Rc] one-hot MXU contraction plus a 17-row VMEM read-modify-
    # write (kernels/tri_grid_rows._merge_tile) — per tile, per
    # sub-group.  "deferred": the kernel carries only (best t, winner
    # row index) and the 17 attribute rows are fetched AFTER the sweep
    # by ONE XLA gather from the [T*St, 17] table — identical winners
    # (same tie-breaks), strictly less per-tile work.  PRICED on chip
    # (tpu_jobs 600, config-4 shape, interleaved): deferred LOSES ~4%
    # every rep (best 1.794 s fused vs 1.862 deferred) — the XLA
    # post-sweep gather costs more than the in-kernel merges it drops
    # (TPU gather economics again, cf. the multisort compactor).
    # "auto" = fused, the measured winner.
    tri_gather: str = "auto"  # "auto" | "fused" | "deferred"
    # Triangle-grid tile partition: how contiguous tile membership is
    # chosen from the centroid cloud.  "morton" cuts a space-filling
    # curve; "median" recursively median-splits the widest axis (tighter
    # tile AABBs — tri_accel._median_split_order).  "auto" = morton
    # until the chip A/B decides.
    tri_partition: str = "auto"  # "auto" | "morton" | "median"
    # Two-phase triangle pass (kernels/tri_rebin.py): sphere pass first,
    # then the triangle working set is lax.sorted by an occlusion-CAPPED
    # chord key (no-touch lanes packed last) before the grid kernel and
    # unsorted after — per-block tile unions tighten by the occlusion
    # the driver-level bin sort can never see (offline ceiling: 92x less
    # pair work, bench/tri_knob_sim.py --ideal).  Replaces driver-level
    # ray binning when on; state lanes are never permuted, so results
    # match rebin-off exactly (cross-tile tie rule aside).  "dda" goes
    # further (kernels/tri_dda.py): lanes EXPAND into the macro cells
    # their capped chord visits (fixed K slots) and the pair list sorts
    # by cell, so every ray block covers ~one cell — the corrected
    # overflow model gives it only ~1.18x over "on" at matched knobs
    # (K=12, St=16, RB=128; losses at K=4 or RB=512 — tri_knob_sim
    # --dda).  "auto" = off until the chip A/B decides.
    tri_rebin: str = "auto"  # "auto" | "on" | "dda" | "off"
    # Pair slots per lane for tri_rebin="dda" (kernels/tri_dda.py
    # k_max).  Lanes whose capped chord spans more macro-cells fall
    # back to one full-segment pair, so small K stays exact but mixes
    # whole-chord unions into their first cell's blocks: the corrected
    # sim models 1.18x (K=12, St=16, RB=128) vs 0.77x — a LOSS —
    # (K=4, RB=512) over tri_rebin="on" at matched knobs; K trades
    # gain against a K*lanes pair working set (tri_knob_sim --dda).
    # 0 = the kernel default (4).
    tri_dda_k: int = 0
    # Wavefront chunk size (lanes in flight per jit call).  4M lanes =
    # ~280 MB of state: one-chunk renders up to ~1200x800 with 4
    # lanes/pixel, the measured sweet spot on a v5e chip (bigger chunks
    # amortize the sequential sample tail; HBM holds ~16 GB).
    rays_per_chunk: int = 1 << 22

    # Scheduler: "wavefront" = one lane per (pixel, sample), fixed
    # max_depth+1 bounce steps (simple, but lanes idle once their path
    # ends); "persistent" = one lane per pixel, samples run sequentially
    # with immediate respawn on path termination (~3x less wasted work on
    # the RTIOW scene); "auto" picks persistent when samples >= 8.
    scheduler: str = "auto"
    # Persistent scheduler: steps between host-side all-done checks (each
    # check costs one device sync).  The loop backs off to a 32-step
    # cadence when the alive count plateaus or the batch is below the
    # compaction floor; an explicit value above 32 raises that back-off
    # cap too (rarer-checks A/B knob for the dispatch-bound tail).
    check_period: int = 0  # 0 = auto
    # One-shot chunk rendering (persistent scheduler): run a whole lane
    # chunk to completion inside ONE jitted program — a lax.while_loop
    # whose body is the one-program XLA bounce and whose condition is
    # "any lane alive" — instead of the host-driven check/compact loop.
    # Small renders are dispatch-bound (the ~3 ms/dispatch floor and
    # ~27 ms alive-check syncs dominate: config 1 spends ~97% of its
    # wall time there), and below the compaction floor the host loop
    # has no compaction decisions left to make anyway.  The loop body
    # is the same bounce step with the same draw derivation (results
    # match sequential dispatches bitwise; vs the host driver they
    # match until its first split/compaction re-keys lane draws —
    # statistically equivalent after that).  Above-floor chunks use it
    # as a TAIL FINISHER: the host loop compacts normally, and at its
    # first below-floor check it splits once and hands the remaining
    # work to the while_loop program (no further host round trips).
    # "auto" = WHOLE-CHUNK while_loops only, when no feature that needs
    # the host loop BETWEEN steps is active (ray binning / tri rebin,
    # an explicit pallas scatter_backend).  The above-floor tail
    # finisher is NOT part of auto: on chip it measured a ~10% loss at
    # the 1200x800@100 headline (tpu_jobs 500, median 2.28s vs 2.08s)
    # while the whole-chunk form measured 1.6x at 400x200@16 (tpu_jobs
    # 510).  "on" = whole-chunk AND tail finisher, raising on a
    # conflict instead of silently falling back (A/B arm for
    # tail-heavy shapes); "off" always uses the host loop.
    # "staged" = STAGED device-side tail (persistent.p_render_until):
    # below the compaction floor, each stage is one while_loop that
    # exits when the alive count reaches the floor-pow2 of half the
    # width — the exact point the host loop's compact+split condition
    # first holds — then the host performs that one compact+split and
    # re-enters.  Keeps the finisher's zero-round-trip property between
    # events while fixing its measured loss (fixed-width dead-lane
    # sweeps, tpu_jobs 500/577); chunks that START below the floor
    # stage from step 0.  Same conflicts as "on".  PRICED OUT as a
    # default (tpu_jobs 602/613): each halving stage compiles its own
    # while-program per stage size, and on the sharded driver ONE
    # stage's compile exceeded 40 minutes — a multi-program compile
    # ladder that a small steady-state delta can never repay
    # (docs/perf_roadmap.md round-4 log).  Kept as an explicit
    # experiment arm only.
    one_shot: str = "auto"  # "auto" | "on" | "off" | "staged"
    # Tail multi-bounce width: bounces per dispatched program once a
    # chunk is at/below the compaction floor (dispatch-bound regime —
    # persistent.p_bounce_multi_step, and the shard_mapped twin in
    # parallel/persistent_shard._steps).  Bigger K = proportionally
    # fewer host dispatches through the ~3 ms relay floor, at the cost
    # of a super-linearly larger one-time compile (runtime notes rule
    # 5) and up to K-1 wasted bounces after the last lane dies.  The
    # sharded driver's +38% small-batch-tail residual (tpu_jobs 575)
    # is the motivating regime.  0 = auto (currently 4).
    multi_k: int = 0
    # Engine for the below-floor multi-bounce programs: "xla" = the
    # fori_loop XLA cores (p_bounce_multi_step); "fused" = k unrolled
    # Mosaic fused bounces in one program (bounce_pallas.
    # p_bounce_multi_fused) — ~5.6 vs ~9.5-10 ns/lane-step at tail
    # sizes (tpu_jobs 990 anatomy), numerically the fused kernel's
    # split-bf16 hit instead of the XLA f32 hit (statistically
    # equivalent, same stance as fuse_bounce).  "" = auto: "xla".  The
    # fused arm wins +2.9% at the headline once warm (tpu_jobs n630
    # interleaved: 1.827 vs 1.881 s best-of-4) but was DISQUALIFIED as
    # the default by its cold-compile surface: one k-unrolled Mosaic
    # rung program stalled a cold headline warm >40 min (round-5
    # README-regen session) vs ~6 min for the whole XLA-multi set
    # (tpu_jobs 614) — the staged-ladder rule (tpu_jobs 602/613).
    # Opt in on a warm cache with "fused"; the sharded ABOVE-floor
    # multi-chaining is likewise opt-in (~neutral, tpu_jobs s638).
    # Only takes effect where the fused kernel runs at all
    # (fuse_bounce resolution); binned scenes always single-step.
    multi_backend: str = ""
    # Split-bf16 limb-pair count of the v7/fused hit quadratic
    # (kernels/hit_pallas_v6._PAIRS): 6 = ~f32 quality (K=96 MXU
    # columns); 3 = 3-pass quality (K=48, half the MXU term of the
    # roofline, docs/perf_roadmap.md round-5) at the documented
    # grazing-accuracy stance (discriminant O(1e-3) absolute -> hit
    # flips only within ~1e-3 of tangency).  0 = auto (6; revisit with
    # tpu_jobs k626's pricing).
    hit_terms: int = 0
    # Compaction size grid quantum (persistent scheduler): >0 rounds
    # above-floor compactions up to a multiple of this ABSOLUTE quantum
    # (the pre-round-4 behavior; 64k beat 256k by ~4% at the headline,
    # tpu_jobs 550, but makes rung sizes alive-count-dependent — every
    # new seed/config compiles never-seen step programs, the warm-up
    # surface that blew BENCH_r03's 1220 s and two config-3 remeasures,
    # tpu_jobs 592/598).  0 = auto: the seed-independent RELATIVE
    # (mantissa) grid — 16 sizes per power-of-two octave, a fixed
    # enumerable rung set shared by all seeds/configs/image shapes
    # (persistent._mantissa_grid), ~2% more padding than 64k near a 4M
    # chunk top and 64k-equivalent by the 1M rung.
    compact_quantum: int = 0
    # Above-floor compaction trigger: compact when the next grid size is
    # <= this fraction of the current batch.  The round-4 anatomy
    # (tpu_jobs 990) statically priced mid-rung events as marginal
    # (2.36M -> 1.64M: ~67 ms multisort for ~35 ms of saved sweeps),
    # but the on-chip sweep REFUTED lowering the trigger (tpu_jobs 621,
    # headline, interleaved): 0.90 best 1.900 s, 0.75 1.903, 0.60
    # 1.909, 0.50 2.065, 0.40 2.185.  The static model undercounted
    # what a skipped event costs: the batch stays full-size for the
    # whole plateau until the NEXT CHECK (period backs off to 16-32
    # steps while alive plateaus), not merely until the next would-be
    # event.  0.0 = auto (0.90, the measured winner); range (0, 1).
    compact_shrink: float = 0.0
    # Compaction engine: "sort" = the 20-operand stable lax.sort
    # (_compact_core); "route" = the bit-serial stable-partition router
    # (persistent._compact_route_core) — same surviving-lane slots (the
    # continuing render is bit-identical), no sort network at runtime
    # OR compile time; retained-dead lanes become synthesized zero-quota
    # padding and the dropped-tail flush is an unsorted segment_sum.
    # "" = auto (currently "sort" — flip after the round-5 on-chip
    # pricing, tpu_jobs i623/l627).  Receiver-redistribution events
    # (cfg.redistribute="on") always use the sort engine.
    compactor: str = ""
    # Dropped-tail flush engine at compactions: "scatter" = XLA
    # segment_sum (measured ~33 ns per scattered f32 — ~75% of the whole
    # top-rung compaction, tpu_jobs i623); "window" = dense windowed
    # accumulation of the pixel-sorted stream (block one-hot MXU
    # contraction + dynamic-update-slice, sparse-block scatter fallback
    # under lax.cond — persistent._window_flush).  "" = auto (currently
    # "scatter"; flip rides tpu_jobs o633's on-chip pricing).
    flush_mode: str = ""
    # Persistent scheduler: replica lanes per pixel (samples split across
    # K lanes with quota spp/K each — more parallelism for hard pixels,
    # shorter sequential tails, bigger batches).  0 = auto (largest of
    # 8/4/2 dividing spp with quota >= 4).  Must divide samples.
    lanes_per_pixel: int = 0
    # Difficulty-adaptive lane allocation (persistent scheduler,
    # adaptive.py): a quota-1 prepass (lanes_per_pixel samples) measures
    # per-pixel path length, then the remaining samples run on lanes
    # allocated proportional to measured difficulty — hard pixels get
    # more lanes with smaller quotas, which shortens the mostly-dead
    # serial tail that uniform replica counts leave behind (offline
    # replay: bench/policy_sim.py --alloc).  Requires a single-frame
    # unbinned render with samples > lanes_per_pixel.  MEASURED A LOSS
    # on chip at the headline (tpu_jobs 500: best 2.68s vs uniform
    # 1.97s; BENCH_r02 concurs) and at the flythrough shape (tpu_jobs
    # 520: 1.28 vs 2.50 fps) — the prepass + allocator overhead the
    # policy replay priced at ~8% is several times larger in practice.
    # Kept as an opt-in research arm; "off" is the production default.
    adaptive_alloc: str = "off"   # "off" | "on"
    # Transform the prepass difficulty estimate before allocation:
    # max(raw, 3x3 box mean)^1.2 — the box term hedges single-pixel
    # underestimates, the max keeps hard pixels hard, and the mild
    # super-proportional exponent counters regression-to-mean under
    # predictor noise.  Offline replay models -2.6% wall vs the raw
    # estimate (flat in the exponent over ~1.15-1.3; collapses by 1.45
    # when the kpp clamp saturates — docs/perf_roadmap.md item 4).
    # Single-chip driver only.  The chip A/B ran (tpu_jobs 500): pool
    # recovers part of adaptive's loss (2.51s vs 2.68s) but both lose
    # to uniform (1.97s); "auto" therefore stays off.
    adaptive_pool: str = "auto"   # "auto" | "on" | "off"
    # Soft cap on adaptive lanes per pixel (hard cap: remaining samples).
    kpp_max: int = 32

    # Stratified pixel jitter: samples placed on a sqrt(spp) grid within
    # the pixel instead of pure uniform (extension; reduces variance,
    # BASELINE.json config 3).
    stratify: bool = False

    # CI-only: run the persistent scheduler's Mosaic kernels (v7 hit +
    # fused bounce) in Pallas INTERPRET mode so the production headline
    # path — not just the jnp fallback — is pinned to the native oracle
    # on the CPU test runner (tests/test_golden.py).  Tail/one-shot XLA
    # bounces keep the resolved-backend hit fn (jnp on CPU).
    pallas_interpret: bool = False

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def resolve_scheduler(cfg: RenderConfig, samples: int | None = None) -> str:
    """The scheduler "auto" rule, shared by render.render, animation
    batching, and checkpoint pass decomposition (which resolves on the
    PER-PASS spp): the persistent scheduler earns its compaction
    machinery at >= 8 samples; deterministic renders stay on the
    fixed-step wavefront."""
    if cfg.scheduler != "auto":
        return cfg.scheduler
    spp = cfg.samples if samples is None else samples
    return ("persistent"
            if spp >= 8 and not cfg.deterministic else "wavefront")
