"""ctypes wrapper for the native reference-semantics oracle renderer.

``native/rtnative.cpp::rt_oracle_render`` reproduces the tracing semantics
of the reference CPU renderer (win32-raytracer/RayTracer.cpp:392-959) —
recursion limits, material quirks, LCG rejection sampling, tonemap — so
golden-image tests can compare the JAX renderer against reference behavior
without a Windows build.  Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .config import RenderConfig
from .scene.spheres import SphereScene

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "native")
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librtnative.so")


class _Scene(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int),
        ("c1", ctypes.POINTER(ctypes.c_float)),
        ("c2", ctypes.POINTER(ctypes.c_float)),
        ("t1", ctypes.POINTER(ctypes.c_float)),
        ("t2", ctypes.POINTER(ctypes.c_float)),
        ("radius", ctypes.POINTER(ctypes.c_float)),
        ("mat_id", ctypes.POINTER(ctypes.c_int)),
        ("albedo", ctypes.POINTER(ctypes.c_float)),
        ("fuzz", ctypes.POINTER(ctypes.c_float)),
        ("ior", ctypes.POINTER(ctypes.c_float)),
    ]


class _Camera(ctypes.Structure):
    _fields_ = [
        ("look_from", ctypes.c_float * 3),
        ("look_to", ctypes.c_float * 3),
        ("up", ctypes.c_float * 3),
        ("vfov_deg", ctypes.c_float),
        ("aspect", ctypes.c_float),
        ("aperture", ctypes.c_float),
        ("focus_dist", ctypes.c_float),
        ("shutter_open", ctypes.c_float),
        ("shutter_close", ctypes.c_float),
    ]


class _Opts(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("spp", ctypes.c_int),
        ("max_depth", ctypes.c_int),
        ("seed", ctypes.c_uint32),
        ("deterministic", ctypes.c_int),
        ("reflect_thres", ctypes.c_float),
        ("refract_bias", ctypes.c_float),
        ("schlick_ni_over_nt", ctypes.c_int),
        ("lane_truncate", ctypes.c_int),
    ]


def build_native(force: bool = False) -> bool:
    """Build librtnative.so via make; returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "librtnative.so"],
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return False
    return os.path.exists(_LIB_PATH)


_lib: Optional[ctypes.CDLL] = None


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    for name, restype in (("rt_oracle_render", None),
                          ("rt_oracle_render_f32", None)):
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = [ctypes.POINTER(_Scene), ctypes.POINTER(_Camera),
                       ctypes.POINTER(_Opts), ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _pack_scene(scene: SphereScene):
    """Unpad the SoA scene into contiguous arrays for the C ABI."""
    act = np.asarray(scene.active)
    arrs = dict(
        c1=np.ascontiguousarray(np.asarray(scene.center1)[act], np.float32),
        c2=np.ascontiguousarray(np.asarray(scene.center2)[act], np.float32),
        t1=np.ascontiguousarray(np.asarray(scene.t1)[act], np.float32),
        t2=np.ascontiguousarray(np.asarray(scene.t2)[act], np.float32),
        radius=np.ascontiguousarray(np.asarray(scene.radius)[act], np.float32),
        mat_id=np.ascontiguousarray(np.asarray(scene.mat_id)[act], np.int32),
        albedo=np.ascontiguousarray(np.asarray(scene.albedo)[act], np.float32),
        fuzz=np.ascontiguousarray(np.asarray(scene.fuzz)[act], np.float32),
        ior=np.ascontiguousarray(np.asarray(scene.ior)[act], np.float32),
    )
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    sc = _Scene(
        n=int(act.sum()),
        c1=arrs["c1"].ctypes.data_as(fp), c2=arrs["c2"].ctypes.data_as(fp),
        t1=arrs["t1"].ctypes.data_as(fp), t2=arrs["t2"].ctypes.data_as(fp),
        radius=arrs["radius"].ctypes.data_as(fp),
        mat_id=arrs["mat_id"].ctypes.data_as(ip),
        albedo=arrs["albedo"].ctypes.data_as(fp),
        fuzz=arrs["fuzz"].ctypes.data_as(fp),
        ior=arrs["ior"].ctypes.data_as(fp),
    )
    return sc, arrs  # keep arrs alive


def oracle_render(
    scene: SphereScene,
    look_from, look_to, up,
    vfov_deg: float, aperture: float, focus_dist: float,
    cfg: RenderConfig,
    deterministic: bool = False,
    lane_truncate: int = 0,
    shutter=(0.0, 0.05),
    linear: bool = False,
) -> np.ndarray:
    """Render via the native oracle.  Returns u8 [H,W,3] (or f32 if linear)."""
    lib = load()
    if lib is None:
        raise RuntimeError("librtnative.so unavailable (run `make -C native`)")
    sc, keepalive = _pack_scene(scene)
    cam = _Camera(
        look_from=(ctypes.c_float * 3)(*[float(v) for v in look_from]),
        look_to=(ctypes.c_float * 3)(*[float(v) for v in look_to]),
        up=(ctypes.c_float * 3)(*[float(v) for v in up]),
        vfov_deg=vfov_deg, aspect=cfg.width / cfg.height,
        aperture=aperture, focus_dist=focus_dist,
        shutter_open=shutter[0], shutter_close=shutter[1],
    )
    opts = _Opts(
        width=cfg.width, height=cfg.height, spp=cfg.samples,
        max_depth=cfg.max_depth, seed=cfg.seed or 666,
        deterministic=int(deterministic),
        reflect_thres=cfg.reflect_thres,
        refract_bias=cfg.refract_discriminant_bias,
        schlick_ni_over_nt=int(cfg.schlick_uses_ni_over_nt),
        lane_truncate=lane_truncate,
    )
    if linear:
        out = np.empty((cfg.height, cfg.width, 3), np.float32)
        lib.rt_oracle_render_f32(ctypes.byref(sc), ctypes.byref(cam),
                                 ctypes.byref(opts), out.ctypes.data)
    else:
        out = np.empty((cfg.height, cfg.width, 3), np.uint8)
        lib.rt_oracle_render(ctypes.byref(sc), ctypes.byref(cam),
                             ctypes.byref(opts), out.ctypes.data)
    del keepalive
    return out
