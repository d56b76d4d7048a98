"""Cross-round params-npz checkpoint format (models/dator/train.py
save_params_npz / load_params_npz): round-trip through the trainer state and
the embedder's .npz loading path. This is the only checkpoint format that
survives the build container between rounds (via git), so a silent break
here costs a full training run."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instance_based_loc_tpu.models.dator.fourdnet import FourDNetConfig
from instance_based_loc_tpu.models.dator.transreid_vit import TransReIDConfig
from instance_based_loc_tpu.models.dator.train import (
    TrainConfig, create_train_state, load_params_npz, save_params_npz)

TINY_BACKBONE = TransReIDConfig(
    img_height=32, img_width=16, patch_size=8, stride_size=8,
    hidden_size=32, num_layers=2, num_heads=4, local_feature=True,
    dtype=jnp.float32)
TINY_CFG = FourDNetConfig(backbone=TINY_BACKBONE, reduced_dim=16,
                          num_classes=7, dtype=jnp.float32)


def _tiny_state():
    return create_train_state(TINY_CFG, TrainConfig(lora_only=False),
                              jax.random.PRNGKey(0), 32, 16)


def test_npz_roundtrip_preserves_tree_and_values(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "p.npz")
    save_params_npz(state.params, path)
    restored = load_params_npz(state.params, path)
    orig_leaves = jax.tree.leaves(state.params)
    rest_leaves = jax.tree.leaves(restored)
    assert len(orig_leaves) == len(rest_leaves)
    for o, r in zip(orig_leaves, rest_leaves):
        assert np.asarray(o).dtype == np.asarray(r).dtype
        # f32 leaves pass through f16: absolute error bounded by f16 eps
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-3, atol=1e-4)


def test_npz_missing_key_raises(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "p.npz")
    save_params_npz({"params": {"only": np.zeros(3, np.float32)}}, path)
    with pytest.raises(KeyError):
        load_params_npz(state.params, path)


def test_embedder_loads_npz_and_adopts_head_geometry(tmp_path):
    from instance_based_loc_tpu.models.dator.embedder import (
        build_dator_embedder)

    # trainer state has num_classes=7 and train-only aux heads; the
    # embedder template (training=False, default num_classes) must adopt
    # the npz head geometry and ignore the extra aux params
    state = _tiny_state()
    path = str(tmp_path / "p.npz")
    save_params_npz(state.params, path)

    import dataclasses
    embed_cfg = dataclasses.replace(TINY_CFG, num_classes=100)
    embed = build_dator_embedder(path, model_cfg=embed_cfg,
                                 height=32, width=16, max_crops=4,
                                 feature="embedding")
    from instance_based_loc_tpu.memory.detection import Detections

    rgb = np.random.default_rng(0).uniform(0, 255, (40, 30, 3))
    depth = np.random.default_rng(1).uniform(0, 2, (40, 30)).astype(np.float32)
    dets = Detections(
        crops=[rgb.astype(np.uint8)[2:38, 2:28]],
        boxes_xyxy=np.array([[2, 2, 28, 38]], np.float32),
        masks=np.ones((1, 40, 30), bool), phrases=["thing"])
    out = embed(dets, full_rgb_image=rgb.astype(np.uint8),
                full_depth_image=depth)
    assert out.shape == (1, TINY_CFG.reduced_dim)
    assert np.all(np.isfinite(out))


def test_schedule_offset_continues_cosine():
    from instance_based_loc_tpu.models.dator.train import cosine_schedule

    base_cfg = TrainConfig(base_lr=1e-3, epochs=10, steps_per_epoch=10,
                           warmup_epochs=1)
    shifted = dataclasses.replace(base_cfg, schedule_offset_steps=37)
    base = cosine_schedule(base_cfg)
    sched = cosine_schedule(shifted)
    # step k of the warm-started run == step k+37 of the original schedule
    for k in (0, 5, 20, 60):
        np.testing.assert_allclose(float(sched(k)), float(base(k + 37)),
                                   rtol=1e-6)
