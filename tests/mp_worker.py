"""Worker process for the mocked 2-process multi-host test
(tests/test_distributed.py).  Forces the CPU backend *before*
jax.distributed init (the TPU plugin ignores JAX_PLATFORMS), renders its
stride of the chunks, and dumps its partial accumulator + the gathered
image for the parent to verify.

Usage: python mp_worker.py COORD_ADDR PROC_ID NUM_PROCS OUT_DIR
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coord, pid, nproc, out_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.parallel.distributed import initialize
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer
    from hanamaru_tpu.scene.compile import compile_scene

    initialize(coord, pid, nproc)
    assert jax.process_count() == nproc

    cfg = RenderConfig(
        width=48, height=32, sampling=2,
        time_limit_sec=1e9, report_interval_sec=1e9,
        max_rays_per_chunk=2048,   # 48*32*4 = 6144 rays -> 3 chunks
    )
    cs = compile_scene(models.build("material_examples"), models.asset_root())
    r = ProgressiveRenderer(cs, cfg, out_dir=out_dir)
    res = r.render()

    np.savez(
        f"{out_dir}/proc{pid}.npz",
        acc_x=np.asarray(r.acc.x),
        acc_y=np.asarray(r.acc.y),
        acc_z=np.asarray(r.acc.z),
        image=res.image,
        sampled=res.sampled,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
