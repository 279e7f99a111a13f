#!/usr/bin/env python
"""Offline simulator of the persistent scheduler's compaction policy.

The headline render's wall time is ``steps + compactions + flush`` where
``steps`` is the lane-step integral paid at ~5.3 ns/lane plus a
per-dispatch floor (docs/perf_roadmap.md "Remaining render anatomy").
Both terms are pure functions of (a) the per-(pixel, sample) path-length
distribution — measured once by bench/collect_pathlen.py, backend
independent — and (b) the scheduler policy (check cadence, compaction
threshold/quantum/floor, split rule; persistent.py:700-860).  So policies
can be searched HERE, on CPU, in milliseconds per candidate, and only the
winner A/B'd on the chip (where one interleaved A/B costs ~20 min of
relay time).

Replay fidelity: this mirrors render_image_persistent's control flow —
first check at quota+2, overlapped alive reads (the count is stale by the
ov optimistic steps), adaptive cadence backoff, quantized compaction
sizes (_grid_size), the below-floor split, and multi-bounce tail
programs.  Validation: with the shipped constants it must reproduce the
measured anatomy (294M lane-steps, ~1.9 s steps + ~0.3 s compaction at
the 1200x800@100 headline; bench/tpu_jobs job 131) before any search
result is believed.

Cost model (interleaved measurements, docs/axon_runtime_notes.md rule 12):
  step(n)    = A*n + B              (Mosaic two-dispatch bounce, n > floor)
  step(n)    = A*n + B_xla          (XLA fused bounce, n <= floor)
  step(n)    = A*n + B_multi        (inside a k=4 multi-bounce program)
  compact(n) = C*n + D              (19-operand lax.sort at batch n)
  check      = CHK                  (residual sync not hidden by overlap)
"""

import argparse
import json
import os
import sys

import numpy as np

# ---------------------------------------------------------------- cost model
# Calibrated against interleaved on-chip measurements (see module doc).
A = 5.3e-9        # s per lane-step at compute-bound sizes (job 131)
B = 1.2e-3        # s per two-dispatch Mosaic bounce (dispatch+epilogue)
B_XLA = 1.8e-3    # s floor of the XLA tail bounce (4.6 ms at 524288 =
                  # A*524288 + B_XLA; bench/tpu_jobs job 200)
B_MULTI = 0.7e-3  # s per bounce inside a fori k=4 program (10-25% off)
C = 24e-9         # s per lane of multisort compaction (93 ms at 3.84M)
D = 12e-3         # s fixed per compaction (flush + reshape dispatches)
RTT = 27e-3       # s relay round trip of the alive-count read; the ov
                  # optimistic steps hide min(RTT, ov*step) of it

_COMPACT_QUANTUM = 1 << 18
_COMPACT_FLOOR = 1 << 19
_COMPACT_SHRINK = 0.90
_MULTI_K = 4
MIN_LANES = 1 << 12


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def _grid_size(n_alive: int, quantum: int, floor: int) -> int:
    if n_alive >= floor:
        q = quantum
        return ((n_alive + q - 1) // q) * q
    return max(MIN_LANES, _next_pow2(n_alive))


# ------------------------------------------------------------ lane synthesis
def synth_lanes(npz_path: str, spp: int, kpp: int, seed: int,
                shuffle_pixels: bool = False, n_pixels: int = 1200 * 800):
    """Per-lane sample-length sequences for the headline image.

    Each sampled pixel's empirical lengths (SPP_collected draws) act as
    that pixel's length distribution; a lane of pixel p draws its
    quota = spp//kpp lengths i.i.d. from p's empirical set (bootstrap).
    ``shuffle_pixels`` draws from the GLOBAL pool instead — the upper
    bound of any cross-pixel work-shuffling mechanism (hard pixels'
    all-long samples are the tail; mixing pixels collapses lane-total
    variance toward sqrt(quota)).

    Returns lengths [L, quota] uint8, lanes sorted in pixel-major order
    (identical to PathState.pixel layout).
    """
    d = np.load(npz_path)
    lens = d["lengths"]            # [n_sampled_pix, spp_collected] uint8
    n_pix = lens.shape[0]
    quota = spp // kpp
    rng = np.random.default_rng(seed)
    L = n_pixels * kpp             # REAL lane count: thresholds (floor,
    #                                quantum) are absolute lane counts, so
    #                                the batch must be simulated at scale.
    if shuffle_pixels:
        pool = lens.reshape(-1)
        idx = rng.integers(0, pool.shape[0], size=(L, quota))
        return pool[idx]
    # Each sampled pixel stands in for ~n_pixels/n_pix real pixels (the
    # collector samples every BAND_STRIDE-th row); policy decisions see
    # only counts, so the lane->pixel assignment order is irrelevant.
    pix = np.resize(np.arange(n_pix), n_pixels)
    # bootstrap per pixel: [L, quota] draws of column indices
    cols = rng.integers(0, lens.shape[1], size=(L, quota))
    rows = np.repeat(pix, kpp)[:, None]
    return lens[rows, cols]


def synth_lanes_adaptive(npz_path: str, spp: int, mean_kpp: int, seed: int,
                         n_pixels: int = 1200 * 800, kpp_max: int = 32,
                         predictor: str = "bootstrap"):
    """Difficulty-adaptive lane allocation (heterogeneous kpp).

    Each pixel p gets kpp_p lanes proportional to its PREDICTED mean path
    length, clamped to [1, kpp_max] and to spp (a lane needs >= 1 sample),
    with the total lane budget fixed at n_pixels*mean_kpp (same batch as
    uniform kpp).  Lane quotas split spp exactly (first spp % kpp_p lanes
    get one extra sample) — the accounting PathState.s_base/s_quota
    already supports.

    ``predictor``:
      bootstrap — the pixel's own 4 collected samples play the role of a
        cheap prepass estimate (what a 1-step primary-material probe or a
        4-spp prepass would see), and the render draws FRESH bootstrap
        lengths, so predictor noise is modeled, not assumed away.
      oracle    — predict with the same draws used for the render
        (upper bound of a perfect predictor).

    Returns (lengths [L, max_quota] uint8 zero-padded, quota [L] int16).
    """
    d = np.load(npz_path)
    lens = d["lengths"]
    n_pix = lens.shape[0]
    rng = np.random.default_rng(seed)
    pix = np.resize(np.arange(n_pix), n_pixels)
    if predictor == "bootstrap":          # all 4 collected samples
        est_p = lens.mean(axis=1)
    elif predictor.startswith("draws"):   # k fresh bootstrap draws
        k = int(predictor[5:])
        cols = rng.integers(0, lens.shape[1], size=(n_pix, k))
        est_p = lens[np.arange(n_pix)[:, None], cols].mean(axis=1)
    elif predictor.startswith("trunc"):   # "trunc<k>x<cap>": k draws,
        k, cap = map(int, predictor[5:].split("x"))  # lengths capped at
        cols = rng.integers(0, lens.shape[1], size=(n_pix, k))  # cap steps
        est_p = np.minimum(lens[np.arange(n_pix)[:, None], cols],
                           cap).mean(axis=1)
    elif predictor.startswith("smooth"):  # "smooth<k>": k fresh draws,
        # then a 3x3 spatial box filter over the collection grid.
        # Pixel difficulty is spatially correlated (object edges,
        # glass), so neighbor pooling cuts the prepass estimator's
        # variance ~9x at a small blur-bias cost — the allocator only
        # needs RELATIVE difficulty, not sharp boundaries.
        k = int(predictor[6:])
        cols = rng.integers(0, lens.shape[1], size=(n_pix, k))
        raw = lens[np.arange(n_pix)[:, None], cols].mean(axis=1)
        ys, xs = d["ys"], d["xs"]
        H, W = int(ys.max()) + 1, int(xs.max()) + 1
        img = np.zeros((H, W)); img[ys, xs] = raw
        pad = np.pad(img, 1, mode="edge")
        sm = np.zeros_like(img)
        for dy in range(3):
            for dx in range(3):
                sm += pad[dy:dy + H, dx:dx + W]
        est_p = (sm / 9.0)[ys, xs]
    else:
        raise ValueError(predictor)
    est = est_p[pix]                      # prepass estimate per pixel
    budget = n_pixels * mean_kpp
    # Proportional allocation with iterative renorm under clamping.
    w = est / est.sum()
    kpp_p = np.clip(np.round(w * budget).astype(np.int64), 1,
                    min(kpp_max, spp))
    # fix the budget exactly: trim/grow the largest/smallest
    diff = int(kpp_p.sum() - budget)
    if diff > 0:
        idx = np.argsort(-kpp_p)
        take = idx[:diff]
        kpp_p[take] = np.maximum(1, kpp_p[take] - 1)
    elif diff < 0:
        idx = np.argsort(-est)            # grow the hardest first
        grow = idx[: -diff]
        kpp_p[grow] = np.minimum(min(kpp_max, spp), kpp_p[grow] + 1)
    L = int(kpp_p.sum())
    # per-lane pixel + quota
    lane_pix = np.repeat(pix, kpp_p)
    base_q = spp // np.repeat(kpp_p, kpp_p)
    extra_rank = (np.arange(L)
                  - np.repeat(np.cumsum(kpp_p) - kpp_p, kpp_p))
    quota = (base_q
             + (extra_rank < np.repeat(spp % kpp_p, kpp_p))).astype(np.int16)
    max_q = int(quota.max())
    cols = rng.integers(0, lens.shape[1], size=(L, max_q))
    lengths = lens[lane_pix[:, None], cols].astype(np.uint8)
    # zero out beyond each lane's quota
    lengths[np.arange(max_q)[None, :] >= quota[:, None]] = 0
    return lengths, quota


# ------------------------------------------------------------------- replay
def simulate(lengths: np.ndarray, *, scale: float = 1.0,
             check_period: int = 8, first_extra: int = 2,
             quantum: int = _COMPACT_QUANTUM, floor: int = _COMPACT_FLOOR,
             shrink: float = _COMPACT_SHRINK, split_ratio: float = 0.5,
             ov_rule=None, backoff: bool = True, verbose: bool = False,
             quota_arr: np.ndarray = None, first_check: int = None):
    """Replay the persistent driver over per-lane length sequences.

    ``lengths`` [L, quota]; ``scale`` multiplies batch sizes in the cost
    model only (simulating on a row subsample of the full image).
    ``split_ratio``: split below the floor when k_new <= cur*split_ratio
    (driver: 0.5).  ``ov_rule(cur)`` -> optimistic steps overlapped with
    the alive read (driver: 1 if cur>=2M else 2 if cur>=1M else 4).

    Returns dict with wall-time breakdown and the lane-step integral.
    """
    if ov_rule is None:
        def ov_rule(cur):
            return 1 if cur >= (1 << 21) else (2 if cur >= (1 << 20) else 4)

    quota = lengths.shape[1]
    if quota_arr is None:
        quota_arr = np.full(lengths.shape[0], quota, np.int32)
    else:
        quota_arr = quota_arr.astype(np.int32)
    # Death step of each lane = sum of its sample lengths (respawn starts
    # the next sample inside the same scatter dispatch; persistent.py
    # _respawn_core).  Sample boundaries (prefix sums) feed the split.
    # Zero-padded rows (heterogeneous quotas) leave the prefix flat past
    # the lane's real quota, so death and done-counts stay correct.
    prefix = np.cumsum(lengths.astype(np.int32), axis=1)  # [L, quota]
    death = prefix[:, -1].copy()                          # [L]
    # Active lane set: store as arrays; below the floor L is small so
    # per-lane bookkeeping is cheap.
    cur_death = np.sort(death)            # death steps of lanes in batch
    # For splits we need per-lane state; keep full rows until first split.
    lane_prefix = prefix                  # rows aligned with cur order? no
    # Keep an index into the original rows for the unsorted batch; order
    # inside the batch is irrelevant to the policy (counts only).
    lane_ids = np.arange(lengths.shape[0])

    if first_check is None:
        first_check = quota + first_extra
    max_steps = (quota + 1) * 12          # max_depth 10 -> (quota+1)*(d+2)
    step = 0
    cur = lengths.shape[0]                # current batch size (with dead)
    period = check_period
    last_alive = cur
    t_steps = 0.0
    t_compact = 0.0
    t_check = 0.0
    lane_steps = 0
    n_compacts = 0
    n_splits = 0
    events = []

    def alive_at(s):
        # lanes in batch with death > s
        return int(cur_death.shape[0]
                   - np.searchsorted(cur_death, s, side="right"))

    def cost_steps(k, cur, fused_tail):
        nonlocal t_steps, lane_steps
        lane_steps += k * cur
        n_eff = cur * scale
        if fused_tail:
            # multi-bounce programs cover floor(k/4)*4 bounces
            k_multi = (k // _MULTI_K) * _MULTI_K
            k_single = k - k_multi
            t_steps += k_multi * (A * n_eff + B_MULTI)
            t_steps += k_single * (A * n_eff + B_XLA)
        else:
            t_steps += k * (A * n_eff + B)

    while step < max_steps:
        next_check = first_check if step < first_check else step + period
        k = min(next_check, max_steps) - step
        fused = cur <= floor
        cost_steps(k, cur, fused)
        step += k
        # count dispatched on the state at `step`; ov optimistic steps run
        # while it transfers -> the count read is AS OF `step` (stale).
        stale_alive = alive_at(step)
        ov = min(ov_rule(cur), max_steps - step)
        cost_steps(ov, cur, fused)
        step += ov
        # the count read blocks for whatever the ov steps didn't hide
        per_step = (A * cur * scale
                    + (B_XLA if fused else B))
        t_check += max(0.0, RTT - ov * per_step)
        n_alive = stale_alive
        if n_alive == 0:
            break
        if cur < floor:
            period = 32
        elif backoff and n_alive > 0.9 * last_alive:
            period = min(period * 2, 32)
        else:
            period = check_period
        last_alive = n_alive

        if cur <= floor:
            k_new = max(MIN_LANES, _next_pow2(n_alive))
            if k_new <= cur * split_ratio:
                # compact to k_new then split (doubles batch, halves
                # remaining unstarted quota of every lane)
                n_compacts += 1
                n_splits += 1
                t_compact += C * cur * scale + D
                # keep alive lanes only
                keep = death[lane_ids] > step
                lane_ids = lane_ids[keep]
                # split: clone takes give = max(q-1-sample,0)//2 unstarted
                # samples (persistent._split).  Per-lane samples fully
                # finished by `step`:
                pr = prefix[lane_ids]
                q_l = quota_arr[lane_ids]
                done = (pr <= step).sum(axis=1)
                give = np.maximum(q_l - 1 - done, 0) // 2
                # clone respawns on the next step and runs the donor's
                # LAST `give` real samples; its death = step + their
                # total length (prefix is flat past q_l, so index at the
                # real quota).
                tail_steps = pr[:, -1] - np.where(
                    give > 0,
                    pr[np.arange(pr.shape[0]),
                       np.maximum(q_l - 1 - give, 0)],
                    pr[:, -1])
                clone_death = step + tail_steps
                # donor loses those samples
                new_death = death[lane_ids] - tail_steps
                death = np.concatenate([death, clone_death])
                # donors keep ids; clones get new ids with truncated rows
                # (prefix rows for clones: not needed again unless they
                # split again — approximate their samples as one blob; a
                # second split gives them 0 (conservative).)
                clone_rows = np.full((clone_death.shape[0], quota),
                                     0, np.int32)
                clone_rows[:, -1] = np.maximum(tail_steps, 0)
                clone_prefix = step + np.cumsum(clone_rows, axis=1)
                prefix = np.concatenate([prefix, clone_prefix])
                quota_arr = np.concatenate(
                    [quota_arr, np.maximum(give, 1)])
                death[lane_ids] = new_death
                # driver: _compact to k_new then _split -> cur = 2*k_new
                clone_ids = np.arange(len(death) - len(clone_death),
                                      len(death))
                lane_ids = np.concatenate([lane_ids, clone_ids])
                cur = 2 * k_new
                cur_death = np.sort(death[lane_ids])
                events.append(("split", step, cur, n_alive))
            continue
        k_base = _grid_size(n_alive, quantum, floor)
        if k_base <= int(cur * shrink):
            n_compacts += 1
            t_compact += C * cur * scale + D
            keep = death[lane_ids] > step
            lane_ids = lane_ids[keep]
            cur = k_base
            cur_death = np.sort(death[lane_ids])
            events.append(("compact", step, cur, n_alive))

    total = t_steps + t_compact + t_check + 0.05  # final flush ~0.05 s
    return {
        "wall_s": round(total, 4),
        "steps_s": round(t_steps, 4),
        "compact_s": round(t_compact, 4),
        "check_s": round(t_check, 4),
        "lane_steps_M": round(lane_steps * scale / 1e6, 1),
        "n_compacts": n_compacts,
        "n_splits": n_splits,
        "final_step": step,
        "events": events if verbose else len(events),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=os.path.join(
        os.path.dirname(__file__), "pathlen_final.npz"))
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--kpp", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scale", type=float, default=None,
                    help="batch scale vs the real 3.84M-lane headline "
                         "(default: inferred from sample count)")
    ap.add_argument("--search", action="store_true")
    ap.add_argument("--shuffle", action="store_true",
                    help="draw lane samples from the global pool "
                         "(cross-pixel shuffling upper bound)")
    ap.add_argument("--alloc", action="store_true",
                    help="difficulty-adaptive lane allocation "
                         "(heterogeneous kpp at the same lane budget)")
    ap.add_argument("--kpp-max", type=int, default=32)
    ap.add_argument("--predictor", default="bootstrap",
                    help="bootstrap | draws<k> | trunc<k>x<cap>")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    quota_arr = None
    if args.alloc:
        lengths, quota_arr = synth_lanes_adaptive(
            args.npz, args.spp, args.kpp, args.seed, kpp_max=args.kpp_max,
            predictor=args.predictor)
    else:
        lengths = synth_lanes(args.npz, args.spp, args.kpp, args.seed,
                              shuffle_pixels=args.shuffle)
    L_real = 1200 * 800 * args.kpp
    scale = args.scale or (L_real / lengths.shape[0])
    print(f"# lanes simulated {lengths.shape[0]} x quota "
          f"{lengths.shape[1]}, cost-model scale {scale:.2f}")

    fc = None
    if quota_arr is not None:
        fc = int(quota_arr.min()) + 2
    base = simulate(lengths, scale=scale, verbose=args.verbose,
                    quota_arr=quota_arr, first_check=fc)
    print("baseline:", json.dumps(base))
    if args.verbose:
        for e in base["events"]:
            print("   ", e)

    if not args.search:
        return 0

    print("\n# one-knob sweeps around the shipped policy")
    grids = {
        "check_period": [4, 6, 8, 12, 16],
        "quantum": [1 << 16, 1 << 17, 1 << 18, 1 << 19],
        "shrink": [0.80, 0.90, 0.95, 0.995],
        "floor": [1 << 18, 1 << 19, 1 << 20],
        "split_ratio": [0.5, 0.75, 1.0],
        "backoff": [True, False],
    }
    for name, vals in grids.items():
        for v in vals:
            r = simulate(lengths, scale=scale, **{name: v})
            print(f"{name}={v}: wall {r['wall_s']} steps {r['steps_s']} "
                  f"compact {r['compact_s']} lane_steps {r['lane_steps_M']}M"
                  f" (compacts {r['n_compacts']}, splits {r['n_splits']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
