"""Composite scenes: spheres + triangle meshes in one render.

The reference renders spheres only; meshes are a capability extension
(BASELINE.json config 4).  A composite scene simply runs both geometry
sweeps and keeps the nearer hit per ray (ops/hit_tri.combine_hits), so
every downstream stage (scatter, schedulers, sharding) is geometry-
agnostic — it only ever sees HitRecords.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from .spheres import SphereScene
from .triangles import TriangleScene


class CompositeScene(NamedTuple):
    spheres: Optional[SphereScene]
    triangles: Optional[TriangleScene]

    @property
    def padded_size(self) -> int:
        n = 0
        if self.spheres is not None:
            n += self.spheres.padded_size
        if self.triangles is not None:
            n += self.triangles.padded_size
        return n


# Hit functions are static jit arguments downstream — return the SAME
# function object for the same scene structure or every render retraces.
_HIT_FN_CACHE = {}


def make_hit_fn(scene, sphere_fn, tri_fn=None):
    """Resolve a scene (SphereScene | TriangleScene | CompositeScene) and a
    sphere backend into a uniform hit function ``f(scene, o, d, t, min_t)``.

    Triangle indices are offset past the sphere count so HitRecord.idx is
    unique across the composite (matching the reference's global sphere
    index semantics, RayTracer.cpp:539).
    """
    from ..ops.hit_tri import combine_hits, hit_triangles

    if tri_fn is None:
        tri_fn = hit_triangles

    if isinstance(scene, TriangleScene):
        return tri_fn

    if isinstance(scene, CompositeScene):
        if scene.spheres is None and scene.triangles is None:
            raise ValueError("empty composite scene")
        key = ("composite", scene.spheres is None, scene.triangles is None,
               sphere_fn, tri_fn)
        if key not in _HIT_FN_CACHE:
            def composite(sc, o, d, t, min_t=0.001):
                if sc.spheres is None:
                    return tri_fn(sc.triangles, o, d, t, min_t=min_t)
                rec = sphere_fn(sc.spheres, o, d, t, min_t=min_t)
                if sc.triangles is None:
                    return rec
                rec_t = tri_fn(sc.triangles, o, d, t, min_t=min_t)
                return combine_hits(rec, rec_t,
                                    idx_offset_b=sc.spheres.padded_size)
            _HIT_FN_CACHE[key] = composite
        return _HIT_FN_CACHE[key]

    return sphere_fn
