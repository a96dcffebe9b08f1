"""Multi-host execution, mocked with two real jax.distributed processes on
the CPU backend (SURVEY.md §4): disjoint chunk partitions, identical RNG
streams per absolute chunk, and a host-0 image equal to the single-process
render."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hanamaru_tpu.parallel.distributed import local_chunk_ids

pytestmark = pytest.mark.slow

_HERE = os.path.dirname(__file__)
_REPO = os.path.dirname(_HERE)


def test_local_chunk_ids_partition():
    """The stride partition is disjoint and covers every chunk."""
    for num_chunks in (1, 2, 3, 7, 8):
        for nproc in (1, 2, 3):
            parts = [
                local_chunk_ids(num_chunks, i, nproc) for i in range(nproc)
            ]
            flat = sorted(c for p in parts for c in p)
            assert flat == list(range(num_chunks))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single_process(tmp_path):
    """Two jax.distributed CPU processes render disjoint chunks that sum to
    the single-process image (VERDICT r1 item 5)."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    outs = [str(tmp_path / f"w{i}") for i in range(2)]
    for o in outs:
        os.makedirs(o, exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "mp_worker.py"),
             coord, str(i), "2", outs[i]],
            cwd=_REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    d0 = np.load(outs[0] + "/proc0.npz")
    d1 = np.load(outs[1] + "/proc1.npz")

    # disjoint chunk rows: where one process accumulated, the other is zero
    a0, a1 = d0["acc_x"], d1["acc_x"]
    rows0 = np.abs(a0).sum(axis=1) > 0
    rows1 = np.abs(a1).sum(axis=1) > 0
    assert not np.any(rows0 & rows1), "processes rendered overlapping chunks"
    assert np.all(rows0 | rows1), "some chunk was rendered by nobody"

    # the union equals the single-process accumulator exactly
    import jax

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer
    from hanamaru_tpu.scene.compile import compile_scene

    cfg = RenderConfig(
        width=48, height=32, sampling=2,
        time_limit_sec=1e9, report_interval_sec=1e9,
        max_rays_per_chunk=2048,
    )
    cs = compile_scene(models.build("material_examples"), models.asset_root())
    r = ProgressiveRenderer(cs, cfg, out_dir=str(tmp_path / "single"))
    os.makedirs(tmp_path / "single", exist_ok=True)
    res = r.render()

    np.testing.assert_array_equal(d0["acc_x"] + d1["acc_x"], np.asarray(r.acc.x))
    np.testing.assert_array_equal(d0["acc_z"] + d1["acc_z"], np.asarray(r.acc.z))

    # both processes computed the same final (cross-process-summed) image,
    # and it matches the single-process image; host 0 wrote result.png
    np.testing.assert_array_equal(d0["image"], d1["image"])
    np.testing.assert_array_equal(d0["image"], res.image)
    assert os.path.exists(outs[0] + "/result.png")
    assert not os.path.exists(outs[1] + "/result.png"), "host 1 must not write images"
