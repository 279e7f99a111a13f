"""Aux subsystems: progress reporting + checkpoint/resume (SURVEY.md §5)."""

import numpy as np

from win32_raytracer_tpu.config import RenderConfig
from win32_raytracer_tpu.render import render_image, render
from win32_raytracer_tpu.scene.builders import test_scene as make_test_scene
from win32_raytracer_tpu.utils.checkpoint import (
    load_checkpoint, render_with_checkpoints)


def test_progress_events():
    scene = make_test_scene()
    cfg = RenderConfig(width=32, height=16, samples=2, seed=1, backend="jnp",
                       rays_per_chunk=32 * 4 * 2)  # force multiple chunks
    events = []
    render_image(scene, None, cfg, progress=events.append)
    kinds = [e["kind"] for e in events]
    assert kinds[-1] == "done"
    assert kinds.count("chunk") >= 2
    assert events[-2]["rows_done"] == 16
    assert events[-1]["mrays_per_sec"] > 0


def test_checkpoint_resume_identical_image(tmp_path):
    scene = make_test_scene()
    cfg = RenderConfig(width=24, height=12, samples=8, seed=6, backend="jnp",
                       scheduler="wavefront")
    ck = str(tmp_path / "render.ckpt.npz")

    # Uninterrupted reference run.
    img_full = render_with_checkpoints(scene, None, cfg, ck, passes=4)
    state = load_checkpoint(ck)
    assert state is not None and state[1] == 4

    # Interrupted run: a 2-pass budget leaves a partial checkpoint; the
    # resumed render must produce the identical final image.
    ck2 = str(tmp_path / "partial.ckpt.npz")
    partial = render_with_checkpoints(scene, None, cfg, ck2, passes=4,
                                      max_passes_per_run=2)
    assert partial is None  # budget exhausted, not complete
    st2 = load_checkpoint(ck2)
    assert st2 is not None and st2[1] == 2
    img_resumed = render_with_checkpoints(scene, None, cfg, ck2, passes=4)
    np.testing.assert_array_equal(img_resumed, img_full)


def test_checkpoint_resume_persistent_pass_level(tmp_path):
    """The production scheduler checkpoints at pass granularity (VERDICT
    round-1 item 4: config-3-shaped work through scheduler='persistent',
    killed and resumed, must byte-match an uninterrupted run)."""
    scene = make_test_scene()
    cfg = RenderConfig(width=24, height=12, samples=32, seed=6,
                       backend="jnp", scheduler="persistent",
                       russian_roulette=True, stratify=True)
    ck = str(tmp_path / "p.ckpt.npz")
    img_full = render_with_checkpoints(scene, None, cfg, ck, passes=2)
    assert img_full is not None

    ck2 = str(tmp_path / "p_partial.ckpt.npz")
    partial = render_with_checkpoints(scene, None, cfg, ck2, passes=2,
                                      max_passes_per_run=1)
    assert partial is None
    img_resumed = render_with_checkpoints(scene, None, cfg, ck2, passes=2)
    np.testing.assert_array_equal(img_resumed, img_full)


def test_checkpoint_resume_persistent_chunk_level(tmp_path):
    """Mid-pass (row-chunk) resume on the persistent scheduler: kill after
    one chunk of a multi-chunk pass, resume, byte-match."""
    scene = make_test_scene()
    cfg = RenderConfig(width=32, height=16, samples=16, seed=9,
                       backend="jnp", scheduler="persistent",
                       rays_per_chunk=32 * 4 * 4)  # 4-row chunks, kpp=4
    ck = str(tmp_path / "c.ckpt.npz")
    img_full = render_with_checkpoints(scene, None, cfg, ck, passes=1)
    assert img_full is not None

    ck2 = str(tmp_path / "c_partial.ckpt.npz")
    partial = render_with_checkpoints(scene, None, cfg, ck2, passes=1,
                                      max_chunks_per_run=2)
    assert partial is None
    state = load_checkpoint(ck2)
    assert state is not None
    assert state[2]["chunk_accum"] is not None  # mid-pass state persisted
    assert state[2]["chunk_y0"] > 0
    img_resumed = render_with_checkpoints(scene, None, cfg, ck2, passes=1,
                                          chunk_checkpoints=True)
    np.testing.assert_array_equal(img_resumed, img_full)


def test_checkpoint_config_mismatch(tmp_path):
    scene = make_test_scene()
    cfg = RenderConfig(width=16, height=8, samples=4, seed=1, backend="jnp",
                       scheduler="wavefront")
    ck = str(tmp_path / "c.npz")
    render_with_checkpoints(scene, None, cfg, ck, passes=2)
    import pytest
    with pytest.raises(ValueError):
        render_with_checkpoints(scene, None, cfg.replace(seed=2), ck, passes=2)


def test_phase_timer():
    import jax.numpy as jnp
    from win32_raytracer_tpu.utils.profiling import PhaseTimer, mrays

    pt = PhaseTimer()
    with pt.phase("a"):
        jnp.ones((64,)).sum().block_until_ready()
    with pt.phase("a"):
        pass
    with pt.phase("b"):
        pass
    assert pt.counts["a"] == 2 and pt.counts["b"] == 1
    assert pt.totals["a"] > 0
    rep = pt.report()
    assert "a" in rep and "%" in rep
    assert abs(mrays(2_000_000, 2.0) - 1.0) < 1e-9


def test_checkpoint_resume_on_mesh(tmp_path):
    """Multi-chip pass-level checkpointing: a sharded render killed
    after one pass and resumed byte-matches the uninterrupted sharded
    render; chunk granularity is rejected on a mesh."""
    import pytest
    from win32_raytracer_tpu.parallel.shard import make_mesh

    scene = make_test_scene()
    cfg = RenderConfig(width=24, height=12, samples=32, seed=6,
                       backend="jnp", scheduler="persistent")
    mesh = make_mesh(4)
    ck = str(tmp_path / "m.ckpt.npz")
    img_full = render_with_checkpoints(scene, None, cfg, ck, passes=2,
                                       mesh=mesh)
    assert img_full is not None and img_full.shape == (12, 24, 3)

    ck2 = str(tmp_path / "m_partial.ckpt.npz")
    partial = render_with_checkpoints(scene, None, cfg, ck2, passes=2,
                                      max_passes_per_run=1, mesh=mesh)
    assert partial is None
    img_resumed = render_with_checkpoints(scene, None, cfg, ck2, passes=2,
                                          mesh=mesh)
    np.testing.assert_array_equal(img_resumed, img_full)

    with pytest.raises(ValueError, match="chunk_checkpoints"):
        render_with_checkpoints(scene, None, cfg, ck, passes=2, mesh=mesh,
                                chunk_checkpoints=True)
