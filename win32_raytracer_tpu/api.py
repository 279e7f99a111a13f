"""Public render API.

Mirrors the reference's two-function tracer interface (win32-raytracer/
RayTracer.h:16-33):

* :func:`render`       — blocking, returns a :class:`RenderResult`
  (``ptr::render`` analogue; scene/camera are first-class arguments instead
  of hard-coded, RayTracer.cpp:906-915/969);
* :func:`render_async` — completion-callback variant returning a handle
  (``ptr::asyncRender`` analogue, which returned the std::thread).

The result carries the stitched image, the per-block parts (the
``RenderResult::imageParts`` analogue, RayTracer.h:8-13), and the wall-clock
duration (RayTracer.cpp:967, 1006-1007).
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, List, Optional

import numpy as np

from .config import RenderConfig
from .render import render as _render_single
from .scene.builders import get_scene
from .scene.camera import Camera, default_camera
from .scene.spheres import SphereScene


@dataclasses.dataclass
class RenderResult:
    """Analogue of ``ptr::RenderResult`` (RayTracer.h:8-13)."""

    image: np.ndarray            # u8 [H, W, 3], top row first
    duration_ms: float           # wall-clock, like renderDuration
    config: RenderConfig
    mrays_per_sec: float         # primary rays / wall-clock (BASELINE metric)

    @property
    def image_parts(self) -> List[np.ndarray]:
        """Row-block views in top-to-bottom order (imageParts analogue)."""
        block = 8  # the reference's blockSizeY (RayTracer.cpp:979)
        return [self.image[y:y + block] for y in range(0, self.image.shape[0], block)]


def _resolve(scene, cam, cfg):
    cfg = cfg or RenderConfig()
    if isinstance(scene, str):
        scene = get_scene(scene)
    if scene is None:
        # The reference's render() always builds the RTIOW random scene
        # (RayTracer.cpp:969); keep that as the no-argument behavior.
        scene = get_scene("random")
    if cam is None:
        cam = default_camera(cfg.width, cfg.height)
    return scene, cam, cfg


def render(
    scene: Optional[SphereScene | str] = None,
    cam: Optional[Camera] = None,
    cfg: Optional[RenderConfig] = None,
    *,
    mesh=None,
    shard_mode: str = "rows",
) -> RenderResult:
    """Blocking render.  ``scene`` may be a SphereScene, a scene name
    ('test' / 'random' / 'final'), or None (RTIOW random scene, like the
    reference).  Pass a ``jax.sharding.Mesh`` to render across devices."""
    scene, cam, cfg = _resolve(scene, cam, cfg)
    start = time.perf_counter()
    if mesh is not None:
        from .parallel.shard import render_sharded
        image = render_sharded(scene, cam, cfg, mesh=mesh, mode=shard_mode)
    else:
        image = _render_single(scene, cam, cfg)
    dur = (time.perf_counter() - start) * 1e3
    rays = cfg.width * cfg.height * cfg.samples
    return RenderResult(image=image, duration_ms=dur, config=cfg,
                        mrays_per_sec=rays / (dur / 1e3) / 1e6)


class AsyncRender:
    """Handle for an in-flight render (the std::thread analogue)."""

    def __init__(self, thread: threading.Thread):
        self._thread = thread
        self.result: Optional[RenderResult] = None
        self.error: Optional[BaseException] = None

    def join(self, timeout: Optional[float] = None) -> Optional[RenderResult]:
        self._thread.join(timeout)
        if self.error is not None:
            raise self.error
        return self.result

    def done(self) -> bool:
        return not self._thread.is_alive()


def render_async(
    scene: Optional[SphereScene | str] = None,
    cam: Optional[Camera] = None,
    cfg: Optional[RenderConfig] = None,
    callback: Optional[Callable[[RenderResult], None]] = None,
    **kw,
) -> AsyncRender:
    """Non-blocking render; invokes ``callback(result)`` on completion
    (``ptr::asyncRender``, RayTracer.h:20-33)."""
    handle: AsyncRender

    def work():
        try:
            res = render(scene, cam, cfg, **kw)
            handle.result = res
            if callback is not None:
                callback(res)
        except BaseException as e:  # surfaced on join()
            handle.error = e

    thread = threading.Thread(target=work, daemon=True)
    handle = AsyncRender(thread)
    thread.start()
    return handle
