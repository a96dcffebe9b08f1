"""End-to-end runtime: CLI flags, result.txt log parity, snapshots,
checkpoint/resume."""
import os
import re

import numpy as np
import pytest

from hanamaru_tpu.runtime.cli import main


pytestmark = pytest.mark.slow


def _run(tmp_path, *extra):
    out = tmp_path / "out"
    rc = main(
        [
            "-w", "48", "-h", "32", "-s", "2", "-t", "600", "-i", "9999",
            "--scene", "material_examples", "--out-dir", str(out), *extra,
        ]
    )
    assert rc == 0
    return out


def test_render_outputs_and_log(tmp_path):
    out = _run(tmp_path)
    # result.png + final numbered image + result.txt (main.rs:1217,
    # renderer.rs:224, main.rs:47-51)
    assert (out / "result.png").exists()
    assert (out / "000.png").exists()
    log = (out / "result.txt").read_text()
    assert "resolution: 48x32." in log
    assert "max sampling: 2x4 spp." in log
    assert re.search(r"rendering: 1x4 sampled \(last \d", log)
    assert re.search(r"rendering: 2x4 sampled", log)
    assert "reached max sampling" in log
    assert "sampled: 2x4 spp." in log
    assert re.search(r"total .* used .* %", log)

    from PIL import Image

    img = np.asarray(Image.open(out / "result.png"))
    assert img.shape == (32, 48, 3)
    assert img.mean() > 1.0  # not black


def test_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "state.npz")
    out1 = _run(tmp_path, "--checkpoint", ck)
    assert os.path.exists(ck)
    d = np.load(ck)
    assert int(d["sampled"]) == 2

    # resume and render 2 more passes; accumulation continues
    out2 = tmp_path / "out2"
    rc = main(
        [
            "-w", "48", "-h", "32", "-s", "4", "-t", "600", "-i", "9999",
            "--scene", "material_examples", "--out-dir", str(out2),
            "--resume", ck,
        ]
    )
    assert rc == 0
    log = (out2 / "result.txt").read_text()
    assert "resumed from" in log
    assert "sampled: 4x4 spp." in log


def test_crash_resume_from_periodic_checkpoint(tmp_path):
    """Crash-safety: the renderer persists state at every report interval,
    so a killed render resumes from the last interval and converges to the
    exact image an uninterrupted run produces (VERDICT r1 item 8)."""
    import jax
    import jax.numpy as jnp

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer
    from hanamaru_tpu.scene.compile import compile_scene

    cfg = RenderConfig(
        width=48, height=32, sampling=3,
        time_limit_sec=600.0, report_interval_sec=0.0,  # snapshot every pass
    )
    cs = compile_scene(models.build("material_examples"), models.asset_root())
    ck = str(tmp_path / "crash.npz")

    # "crashing" run: periodic checkpoints fire at passes 1 and 2; the
    # final pass 3 is then lost when the process dies
    a = ProgressiveRenderer(cs, cfg, out_dir=str(tmp_path / "a"),
                            checkpoint_path=ck)
    os.makedirs(tmp_path / "a", exist_ok=True)
    a.render()
    d = np.load(ck)
    assert int(d["sampled"]) == 2, "periodic checkpoint missing pass 2"

    # resume from the periodic checkpoint and finish
    b = ProgressiveRenderer(cs, cfg, out_dir=str(tmp_path / "b"))
    os.makedirs(tmp_path / "b", exist_ok=True)
    b.load_checkpoint(ck)
    assert b.sampled == 2
    b.render()

    # uninterrupted reference run
    c = ProgressiveRenderer(cs, cfg, out_dir=str(tmp_path / "c"))
    os.makedirs(tmp_path / "c", exist_ok=True)
    c.render()

    # per-pass RNG is keyed by absolute pass index, so resume must be
    # bit-identical to never having crashed
    np.testing.assert_array_equal(np.asarray(b.acc.x), np.asarray(c.acc.x))
    np.testing.assert_array_equal(np.asarray(b.acc.y), np.asarray(c.acc.y))
    np.testing.assert_array_equal(np.asarray(b.acc.z), np.asarray(c.acc.z))


def test_debug_mode_output(tmp_path):
    out = tmp_path / "dbg"
    rc = main(
        [
            "-d", "--debug-mode", "depth", "-w", "32", "-h", "24",
            "--scene", "material_examples", "--out-dir", str(out),
        ]
    )
    assert rc == 0
    assert (out / "result.png").exists()
    log = (out / "result.txt").read_text()
    assert "sampled: 1x4 spp." in log


def test_fused_whole_pass_matches_chained(tmp_path):
    """bounce_span == num_bounces fuses raygen + every bounce + the
    accumulator update + the per-chunk key folds into one program per
    chunk (runtime/progressive.py fused_chunk_fn).  The PRNG derivations
    are moved in-program unchanged, so the fused pass must reproduce the
    chained pass's accumulator (float-fusion reassociation only)."""
    import jax

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer
    from hanamaru_tpu.scene.compile import compile_scene

    cs = compile_scene(models.build("material_examples"), models.asset_root())
    mk = lambda span: RenderConfig(
        width=32, height=24, sampling=1, bounce_limit=3, bounce_span=span,
        time_limit_sec=1e9, report_interval_sec=1e9,
    )
    key = jax.random.PRNGKey(11)

    chained = ProgressiveRenderer(cs, mk(1), out_dir=str(tmp_path))
    chained.acc = chained._pass(chained.arrays, chained.acc, key)
    fused = ProgressiveRenderer(cs, mk(2), out_dir=str(tmp_path))
    fused.acc = fused._pass(fused.arrays, fused.acc, key)

    for c, f in zip(chained.acc, fused.acc):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(c), rtol=2e-4, atol=1e-5,
        )
