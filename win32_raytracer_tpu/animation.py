"""Animated camera flythroughs (BASELINE.json config 5: tile-parallel
animated camera flythrough sharded over the mesh via shard_map + ICI
reduce).

The reference has no animation (one hard-coded camera, RayTracer.cpp:
906-915); this drives the same render pipeline over a camera path, with
optional mesh sharding per frame.
"""

from __future__ import annotations

import math
import os
import time
from typing import Callable, List, Optional, Sequence

import numpy as np

from .config import RenderConfig
from .scene.camera import Camera, make_camera


def orbit_path(
    look_to=(0.0, 1.0, 0.0),
    radius: float = 16.0,
    height: float = 2.0,
    n_frames: int = 24,
    vfov_degrees: float = 20.0,
    aspect_ratio: float = 4.0 / 3.0,
    aperture: float = 0.1,
    up=(0.0, 1.0, 0.0),
    start_angle: float = 0.0,
    sweep: float = 2.0 * math.pi,
) -> List[Camera]:
    """Circular orbit around ``look_to`` (focus follows the target)."""
    cams = []
    look_to = np.asarray(look_to, np.float32)
    for i in range(n_frames):
        a = start_angle + sweep * i / n_frames
        look_from = np.asarray(
            [look_to[0] + radius * math.cos(a), height,
             look_to[2] + radius * math.sin(a)], np.float32)
        focus = float(np.linalg.norm(look_to - look_from))
        cams.append(make_camera(look_from, look_to, up, vfov_degrees,
                                aspect_ratio, aperture, focus))
    return cams


def render_animation(
    scene,
    cameras: Sequence[Camera],
    cfg: Optional[RenderConfig] = None,
    out_pattern: Optional[str] = None,
    mesh=None,
    shard_mode: str = "rows",
    frame_callback: Optional[Callable[[int, np.ndarray, float], None]] = None,
) -> List[np.ndarray]:
    """Render one image per camera; optionally write ``out_pattern % i``
    (e.g. ``"fly_%04d.png"``) and/or invoke ``frame_callback(i, img, ms)``.

    Frame seeds derive from (cfg.seed, frame index) so animations are
    reproducible and frames decorrelated.
    """
    from .api import render as _render

    cfg = cfg or RenderConfig()
    frames = []
    for i, cam in enumerate(cameras):
        fcfg = cfg.replace(seed=cfg.seed * 1000003 + i)
        t0 = time.perf_counter()
        res = _render(scene, cam=cam, cfg=fcfg, mesh=mesh,
                      shard_mode=shard_mode)
        ms = (time.perf_counter() - t0) * 1e3
        frames.append(res.image)
        if out_pattern:
            from .io.image import write_image
            os.makedirs(os.path.dirname(out_pattern) or ".", exist_ok=True)
            write_image(out_pattern % i, res.image)
        if frame_callback:
            frame_callback(i, res.image, ms)
    return frames
