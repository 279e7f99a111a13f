"""Public API tests (render/render_async/RenderResult, RayTracer.h:16-33
analogues) and CLI behavior (Main.cpp:73-119 analogue)."""

import json
import os
import threading

import numpy as np
import pytest

import win32_raytracer_tpu as wrt
from win32_raytracer_tpu.cli import main as cli_main


CFG = wrt.RenderConfig(width=48, height=32, samples=2, seed=4, backend="jnp")


def test_render_by_scene_name():
    res = wrt.render("test", cfg=CFG)
    assert isinstance(res, wrt.RenderResult)
    assert res.image.shape == (32, 48, 3)
    assert res.image.dtype == np.uint8
    assert res.duration_ms > 0
    assert res.mrays_per_sec > 0
    # imageParts analogue: 8-row blocks, top-to-bottom.
    parts = res.image_parts
    assert len(parts) == 4
    np.testing.assert_array_equal(np.concatenate(parts, axis=0), res.image)


def test_render_default_scene_is_random():
    """No scene argument -> RTIOW random scene (RayTracer.cpp:969)."""
    res = wrt.render(cfg=wrt.RenderConfig(width=16, height=8, samples=1,
                                          seed=0, backend="jnp"))
    assert res.image.shape == (8, 16, 3)


def test_render_async_callback_and_join():
    done = threading.Event()
    got = {}

    def cb(result):
        got["res"] = result
        done.set()

    handle = wrt.render_async("test", cfg=CFG, callback=cb)
    res = handle.join(timeout=300)
    assert done.wait(timeout=10)
    assert got["res"] is res
    assert res.image.shape == (32, 48, 3)
    assert handle.done()


def test_render_async_error_surfaces_on_join():
    handle = wrt.render_async("no-such-scene", cfg=CFG)
    with pytest.raises(ValueError):
        handle.join(timeout=300)


def test_cli_render_writes_image(tmp_path):
    out = tmp_path / "img.png"
    rc = cli_main(["48", "32", "2", "--scene", "test", "--seed", "4",
                   "--backend", "jnp", "--multi-k", "2",
                   "--out", str(out), "--quiet"])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 100


def test_cli_perf_mode(tmp_path, capsys):
    perf = tmp_path / "perf.txt"
    rc = cli_main(["32", "16", "1", "1", "perfTest", "--scene", "test",
                   "--backend", "jnp", "--perf-file", str(perf), "--quiet"])
    assert rc == 0
    ms = float(perf.read_text().strip())
    assert ms > 0
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["unit"] == "Mrays/s"
    assert payload["value"] > 0


def test_cli_animate_writes_frames(tmp_path):
    out = tmp_path / "fly.png"
    rc = cli_main(["32", "16", "8", "--scene", "test", "--backend", "jnp",
                   "--animate", "2", "--batch-frames", "2",
                   "--out", str(out), "--quiet"])
    assert rc == 0
    assert (tmp_path / "fly_0000.png").exists()
    assert (tmp_path / "fly_0001.png").exists()


def test_cli_checkpoint_roundtrip(tmp_path):
    out = tmp_path / "c.png"
    ck = tmp_path / "c.npz"
    rc = cli_main(["24", "16", "4", "--scene", "test", "--backend", "jnp",
                   "--checkpoint", str(ck), "--passes", "2",
                   "--out", str(out), "--quiet"])
    assert rc == 0
    assert out.exists()
    assert ck.exists()  # final checkpoint retained for inspection


def test_cli_defaults_match_reference():
    """Defaults are the reference's pch.h:170-174 values."""
    p = __import__("win32_raytracer_tpu.cli", fromlist=["build_parser"]).build_parser()
    a = p.parse_args([])
    assert (a.width, a.height, a.samples) == (640, 480, 50)
    assert a.out == "out.bmp"  # pch.h:183


def test_graft_entry_single_chip():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out[:4])


def test_graft_dryrun_multichip(eight_devices):
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_cli_animate_accepts_pattern_out(tmp_path):
    """--out may itself be a %-pattern (help: '--out becomes the frame
    pattern'); the CLI must use it verbatim instead of appending _%04d."""
    rc = cli_main(["32", "16", "8", "--scene", "test", "--backend", "jnp",
                   "--animate", "2", "--batch-frames", "2",
                   "--out", str(tmp_path / "f_%02d.png"), "--quiet"])
    assert rc == 0
    assert (tmp_path / "f_00.png").exists()
    assert (tmp_path / "f_01.png").exists()
