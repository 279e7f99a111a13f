"""Superseded hit-kernel generations, kept as documented experiments.

NOT part of the production surface.  The load-bearing kernels live one
level up: v3 (wavefront columns path), v4 (exact VPU rows oracle), v6/v7
(MXU split-bf16 production), bounce_pallas (fused production bounce),
tri_pallas_mxu (triangles), hit_grid_rows (forced-accel grid).

* ``hit_pallas_v1`` — the first ray-block x sphere-block Pallas sweep
  (column layout); superseded by v3's transposed layout.
* ``hit_pallas_v2`` — v1 with sphere data pre-transposed on host;
  measured a wash vs v3.
* ``hit_grid`` — column-layout footprint-mask grid; superseded by
  hit_grid_rows (rows layout).
* ``hit_pallas_v5`` — the MXU-quadratic experiment that measured the
  bf16 precision wall; its coefficient factoring graduated into v6.

Each module's docstring records what was measured and why it lost —
don't re-explore these without new hardware (docs/perf_roadmap.md).
"""
