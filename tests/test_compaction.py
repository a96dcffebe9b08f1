"""Stream compaction is a pure scheduling decision: identical images
(to 1-ulp add re-association at the bank/scatter point),
correct partitioning, conservative bucket choice."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hanamaru_tpu import models
from hanamaru_tpu.config import RenderConfig
from hanamaru_tpu.ops import compaction, integrator
from hanamaru_tpu.runtime.progressive import ProgressiveRenderer
from hanamaru_tpu.scene.compile import compile_scene
from hanamaru_tpu.scene.desc import (
    DIFFUSE,
    CameraDesc,
    CuboidDesc,
    MaterialDesc,
    SceneDesc,
    SkyboxDesc,
    SphereDesc,
    TextureDesc,
)
from hanamaru_tpu.utils.vec import from_stacked


def test_alive_partition_is_stable():
    alive = jnp.asarray([False, True, True, False, True, False])
    perm = np.asarray(compaction.alive_partition(alive))
    np.testing.assert_array_equal(perm, [1, 2, 4, 0, 3, 5])


def test_pick_bucket():
    assert compaction.pick_bucket(100, 1024) == 128          # fits /8
    assert compaction.pick_bucket(400, 1024) == 512          # fits /2 only
    assert compaction.pick_bucket(600, 1024) is None         # too full
    assert compaction.pick_bucket(0, 1024) == 128
    # granule rounds buckets down, so /8 (128->96) can no longer hold 100
    # live lanes and /4 (256->192) wins
    assert compaction.pick_bucket(100, 1024, granule=96) == 192
    assert compaction.pick_bucket(90, 1024, granule=96) == 96


def test_compact_bounces_match_masked_bounces():
    """Running the tail bounces on a compacted prefix reproduces the masked
    full-batch radiance lane-for-lane (the lane_ids RNG contract)."""
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 1, 5), target=(0, 0, 0)),
        elements=[
            CuboidDesc((-4, -1, -4), (4, 0, 4), MaterialDesc(
                DIFFUSE, albedo=TextureDesc.const(0.6, 0.4, 0.2))),
            SphereDesc((0, 2, 0), 0.3, MaterialDesc(
                DIFFUSE, albedo=TextureDesc.black(),
                emission=TextureDesc.gray(10.0))),
        ],
        skybox=SkyboxDesc(),
    )
    cs = compile_scene(scene)
    s = jax.tree.map(jnp.asarray, cs.arrays)

    n = 512
    rng = np.random.RandomState(3)
    o = np.tile([[0.0, 2.0, 4.0]], (n, 1)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] -= 0.8
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov, dv = from_stacked(jnp.asarray(o)), from_stacked(jnp.asarray(d))
    key = jax.random.PRNGKey(9)

    # masked reference: 4 bounces, full batch
    ref = integrator.init_path_state(ov, dv)
    for b in range(4):
        ref = integrator.bounce_step(s, ref, key, b)

    # compacted: 1 full bounce, then partition + prefix for the rest
    st = integrator.init_path_state(ov, dv)
    st = integrator.bounce_step(s, st, key, 0)
    n_alive = int(compaction.count_alive(st.alive))
    assert 0 < n_alive < n, "fixture must kill some but not all rays"
    m = compaction.pick_bucket(n_alive, n)
    assert m is not None and m < n, f"fixture too full to compact ({n_alive})"
    acc_bank = st.acc
    st_c, src = compaction.compact_state(st, m)
    for b in range(1, 4):
        st_c = integrator.bounce_step(s, st_c, key, b, lane_ids=src, n_total=n)
    rad = compaction.scatter_acc(acc_bank, st_c.acc, src)

    # identical randoms and identical per-bounce math; the only allowed
    # deviation is 1-ulp float-add re-association at the bank/scatter point
    for a, b in ((rad.x, ref.acc.x), (rad.y, ref.acc.y), (rad.z, ref.acc.z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-7, atol=2e-7)


def test_progressive_renderer_compaction_identical(tmp_path):
    """End-to-end: compact_from_bounce produces the exact accumulator of
    the masked renderer on a real scene."""
    cfg = RenderConfig(width=48, height=32, sampling=2,
                       time_limit_sec=1e9, report_interval_sec=1e9)
    cs = compile_scene(models.build("material_examples"), models.asset_root())

    a = ProgressiveRenderer(cs, cfg, out_dir=str(tmp_path))
    a.render()
    cfg_c = dataclasses.replace(cfg, compact_from_bounce=2)
    b = ProgressiveRenderer(cs, cfg_c, out_dir=str(tmp_path))
    b.render()

    for u, v in ((a.acc.x, b.acc.x), (a.acc.y, b.acc.y), (a.acc.z, b.acc.z)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-6, atol=1e-6)
