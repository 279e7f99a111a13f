"""Canonical scenes.

Reproduces the reference's two scene builders with bit-identical layouts:

* :func:`test_scene`   — ``getTestScene`` (RayTracer.cpp:707-765)
* :func:`random_scene` — ``generateRandomScene`` (RayTracer.cpp:768-891),
  the RTIOW final scene.  The reference builds it with its seed-666 SSE LCG
  (one ``rand_sse`` per grid cell plus one per lambertian/metal material),
  so with :class:`ReferenceLcg` the sphere positions, colors, fuzz values,
  and material mix here are *exactly* those the C++ renderer traces.
"""

from __future__ import annotations

from ..core import materials as mat
from ..core.rng import ReferenceLcg
from .spheres import SceneBuilder, SphereScene, LANE_PAD


def test_scene(pad_to: int = LANE_PAD) -> SphereScene:
    """6-sphere test scene (RayTracer.cpp:707-765).

    Note the two radius **-0.5** spheres: the reference uses negative radii
    to flip normals (hollow-glass trick).  Also note that the reference's
    AVX hit loop *silently skips* this entire scene (6 % 8 spheres dropped,
    RayTracer.cpp:432-434) — we render it correctly.
    """
    b = SceneBuilder()
    b.add_lambertian((0.0, -100.5, 0.0), 100.0, (0.8, 0.8, 0.0))
    b.add_lambertian((0.0, 0.0, 0.0), -0.5, (0.1, 0.2, 0.5))
    b.add_metal((1.0, 0.0, 0.0), 0.5, (0.8, 0.6, 0.2), 0.0)
    b.add_dielectric((-1.0, 0.0, 0.0), -0.5, 1.5)
    b.add_lambertian((-2.0, 0.0, 0.0), 0.5, (0.6, 0.2, 0.5))
    b.add_lambertian((0.0, 0.0, -1.0), 0.5, (0.3, 0.7, 0.5))
    return b.build(pad_to)


def random_scene(seed: int = 666, pad_to: int = LANE_PAD) -> SphereScene:
    """RTIOW final scene, exact reproduction of RayTracer.cpp:768-891.

    Ground sphere r=1000 + three hero spheres + a 22x22 jittered grid with
    material mix 80% lambertian / 15% metal / 5% dielectric.  Lambertian
    grid spheres are *moving*: +3.0 in y over t in [0, 1]
    (RayTracer.cpp:848-859), sampled by the camera's [0, 0.05] shutter.
    """
    world_length = 22
    radius = 0.2
    pos_randomness = 0.9
    spacing = 1.0

    lcg = ReferenceLcg(seed)
    b = SceneBuilder()

    b.add_lambertian((0.0, -1000.0, 0.0), 1000.0, (0.5, 0.5, 0.5))
    b.add_dielectric((0.0, 1.0, 0.0), 1.0, 1.5)
    b.add_lambertian((-4.0, 1.0, 0.0), 1.0, (0.4, 0.2, 0.1))
    b.add_metal((4.0, 1.0, 0.0), 1.0, (0.7, 0.6, 0.5), 0.0)

    half = world_length // 2
    for a in range(-half, half):
        for c in range(-half, half):
            r = lcg.rand4()
            center = (a * spacing + pos_randomness * float(r[0]),
                      radius,
                      c * spacing + pos_randomness * float(r[1]))
            choice = float(r[2])
            if choice < 0.8:  # lambertian (moving)
                r = lcg.rand4()
                color = (float(r[0] * r[1]), float(r[1] * r[2]), float(r[2] * r[3]))
                b.add_moving(center,
                             (center[0], center[1] + 3.0, center[2]),
                             0.0, 1.0, radius, mat.LAMBERTIAN, albedo=color)
            elif choice < 0.95:  # metal
                r = lcg.rand4()
                fuzz = 0.5 * float(r[0])
                color = (0.5 * (1.0 + float(r[1])),
                         0.5 * (1.0 + float(r[2])),
                         0.5 * (1.0 + float(r[3])))
                b.add_metal(center, radius, color, fuzz)
            else:  # dielectric
                b.add_dielectric(center, radius, 1.5)

    return b.build(pad_to)


def mesh_scene(pad_to: int = LANE_PAD, subdivisions: int = 2):
    """Demo composite scene (extension): diffuse ground + hero spheres plus
    a metal icosphere mesh and a glass box mesh (BASELINE.json config 4 —
    the triangle path; load real assets with scene.triangles.load_obj).

    ``subdivisions`` sets the icosphere density: 2 -> 320 tris (the
    round-1 demo), 5 -> 20480 tris (bunny-class; rendered through the
    Morton-tile grid, tri_accel.py)."""
    import numpy as np
    from .composite import CompositeScene
    from .triangles import box_mesh, build_triangle_scene, icosphere_mesh

    b = SceneBuilder()
    b.add_lambertian((0.0, -1000.0, 0.0), 1000.0, (0.5, 0.5, 0.5))
    b.add_lambertian((-2.5, 1.0, -1.0), 1.0, (0.4, 0.2, 0.1))
    b.add_dielectric((2.5, 1.0, -1.0), 1.0, 1.5)
    spheres = b.build(pad_to)

    v1, f1 = icosphere_mesh((0.0, 1.0, 0.0), 1.0, subdivisions=subdivisions)
    v2, f2 = box_mesh((0.0, 0.35, 2.2), (0.7, 0.7, 0.7))
    verts = np.concatenate([v1, v2], axis=0)
    faces = np.concatenate([f1, f2 + len(v1)], axis=0)
    mats = np.concatenate([np.full(len(f1), mat.METAL, np.int32),
                           np.full(len(f2), mat.DIELECTRIC, np.int32)])
    albs = np.concatenate([np.tile([0.8, 0.7, 0.6], (len(f1), 1)),
                           np.tile([1.0, 1.0, 1.0], (len(f2), 1))]).astype(np.float32)
    tris = build_triangle_scene(verts, faces, mat_id=mats, albedo=albs,
                                fuzz=0.05, ior=1.5, pad_to=pad_to)
    return CompositeScene(spheres=spheres, triangles=tris)


SCENES = {
    "test": test_scene,
    "random": random_scene,
    "final": random_scene,  # alias: RTIOW "final scene"
    "mesh": mesh_scene,
    # Bunny-class mesh (20480-tri icosphere + glass box + spheres):
    # BASELINE config 4 at the scale it was written for.
    "mesh20k": lambda pad_to=LANE_PAD: mesh_scene(pad_to, subdivisions=5),
}


def get_scene(name: str, **kw) -> SphereScene:
    try:
        builder = SCENES[name]
    except KeyError:
        raise ValueError(f"unknown scene {name!r}; available: {sorted(SCENES)}")
    return builder(**kw)
