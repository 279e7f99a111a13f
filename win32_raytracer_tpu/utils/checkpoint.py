"""Checkpoint / resume for long high-spp renders.

The reference has none (SURVEY.md §5: a render runs start-to-finish and
only ``out.bmp`` persists), but its tile decomposition was already
resumable-shaped (``RenderResult::imageParts``).  Here the natural unit is
the per-pixel linear sample accumulator: a render is split into passes of
``samples/passes`` spp each; after every pass the running radiance sum and
pass count go to an ``.npz``, and a restarted render continues from there.
Pass RNG keys derive from (seed, pass index), so a resumed render produces
exactly the image an uninterrupted one would.
"""

from __future__ import annotations

import os

from typing import Optional

import numpy as np

from ..config import RenderConfig
from ..render import render_image, tonemap
from ..scene.camera import Camera, default_camera
from ..scene.spheres import SphereScene

_FORMAT = 1


def load_checkpoint(path: str):
    """Returns (accumulator [H,W,3] f64, passes_done, meta dict) or None."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if int(z["format"]) != _FORMAT:
            raise ValueError(f"unsupported checkpoint format {z['format']}")
        meta = dict(width=int(z["width"]), height=int(z["height"]),
                    samples=int(z["samples"]), seed=int(z["seed"]),
                    passes=int(z["passes"]))
        return np.asarray(z["accum"], np.float64), int(z["passes_done"]), meta


def _save(path: str, accum: np.ndarray, passes_done: int,
          cfg: RenderConfig, passes: int) -> None:
    tmp = path + ".tmp.npz"  # ends in .npz so np.savez won't rename it
    np.savez(tmp, format=_FORMAT, accum=accum, passes_done=passes_done,
             width=cfg.width, height=cfg.height, samples=cfg.samples,
             seed=cfg.seed, passes=passes)
    os.replace(tmp, path)  # atomic publish


def render_with_checkpoints(
    scene: SphereScene,
    cam: Optional[Camera],
    cfg: RenderConfig,
    checkpoint_path: str,
    passes: int = 10,
    hit_fn=None,
    max_passes_per_run: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Render ``cfg.samples`` spp in ``passes`` resumable passes.

    Returns the u8 image once all passes are done; the checkpoint holds
    partial sums until then.  ``max_passes_per_run`` bounds how many passes
    this invocation performs (time-budgeted rendering); if the render is
    still incomplete afterwards, returns None — call again to resume.
    """
    if cfg.samples % passes:
        raise ValueError(f"samples ({cfg.samples}) must divide into "
                         f"passes ({passes})")
    if cam is None:
        cam = default_camera(cfg.width, cfg.height)
    if hit_fn is None:
        from ..kernels.dispatch import get_hit_fn
        hit_fn = get_hit_fn(cfg)
    spp_pass = cfg.samples // passes

    state = load_checkpoint(checkpoint_path)
    if state is not None:
        accum, done, meta = state
        if (meta["width"], meta["height"], meta["samples"], meta["seed"],
                meta["passes"]) != (cfg.width, cfg.height, cfg.samples,
                                    cfg.seed, passes):
            raise ValueError("checkpoint does not match this render config")
    else:
        accum = np.zeros((cfg.height, cfg.width, 3), np.float64)
        done = 0

    end = passes if max_passes_per_run is None else min(
        passes, done + max_passes_per_run)
    for p in range(done, end):
        pass_cfg = cfg.replace(samples=spp_pass,
                               seed=cfg.seed * 1000003 + p)
        linear = np.asarray(render_image(scene, cam, pass_cfg,
                                         hit_fn=hit_fn), np.float64)
        accum += linear * spp_pass
        _save(checkpoint_path, accum, p + 1, cfg, passes)
    if end < passes:
        return None  # budget exhausted; resume with another call

    mean = (accum / cfg.samples).astype(np.float32)
    import jax.numpy as jnp
    return np.asarray(tonemap(jnp.asarray(mean)))
