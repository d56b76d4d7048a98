"""DATOR stack tests: grid-sample parity vs torch, FourDNet forward, losses
vs reference formulas, P x K sampler invariants, CMC/mAP sanity, LoRA-only
training actually learns on a tiny synthetic ReID task."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.dator.fourdnet import (
    FourDNet, FourDNetConfig, bilinear_sample)
from instance_based_loc_tpu.models.dator.transreid_vit import TransReIDConfig
from instance_based_loc_tpu.models.dator.losses import (
    batch_hard_triplet, cross_entropy, reid_loss)
from instance_based_loc_tpu.models.dator.data import PKSampler, ReIDSample
from instance_based_loc_tpu.models.dator.metrics import cmc_map, cosine_distmat


TINY_BACKBONE = TransReIDConfig(
    img_height=32, img_width=16, patch_size=8, stride_size=8,
    hidden_size=32, num_layers=3, num_heads=4, local_feature=True,
    dtype=jnp.float32)
TINY_CFG = FourDNetConfig(backbone=TINY_BACKBONE, reduced_dim=16,
                          num_classes=5, dtype=jnp.float32)


def test_bilinear_sample_matches_torch_grid_sample(rng):
    import torch
    import torch.nn.functional as F
    vmap = rng.normal(size=(4, 6, 3)).astype(np.float32)  # (H, W, C)
    gx = rng.uniform(-1, 1, size=(10, 7)).astype(np.float32)
    gy = rng.uniform(-1, 1, size=(10, 7)).astype(np.float32)

    ours = np.asarray(bilinear_sample(jnp.asarray(vmap), jnp.asarray(gx),
                                      jnp.asarray(gy)))
    t_in = torch.from_numpy(vmap.transpose(2, 0, 1))[None]  # (1, C, H, W)
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))[None]
    ref = F.grid_sample(t_in, grid, align_corners=True, padding_mode="zeros")
    ref = ref[0].permute(1, 2, 0).numpy()  # (10, 7, C)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fourdnet_forward_shapes(rng):
    model = FourDNet(TINY_CFG)
    rgb = jnp.asarray(rng.normal(size=(2, 32, 16, 3)), jnp.float32)
    depth = jnp.asarray(rng.normal(size=(2, 32, 16, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    # init under training=True so the train-only aux tower heads get
    # params (create_train_state does the same); inference ignores them
    params = model.init({"params": key, "dropout": key}, rgb, depth,
                        training=True)
    score, feat = model.apply(params, rgb, depth, training=False)
    assert score.shape == (2, 5)
    assert feat.shape == (2, 16)
    # towers are stacked on a leading axis of 2 (model-parallel shardable)
    tower_kernel = params["params"]["towers"]["patch_embed"]["kernel"]
    assert tower_kernel.shape[0] == 2

    # modality dropout path runs under training; aux CLS heads come back.
    # training=True updates the BNNeck running stats -> mutable collection
    (score_t, _, (aux_r, aux_d)), _ = model.apply(params, rgb, depth,
                                                  training=True,
                                                  rngs={"dropout": key},
                                                  mutable=["batch_stats"])
    assert score_t.shape == (2, 5)
    assert aux_r.shape == (2, 5) and aux_d.shape == (2, 5)


def test_triplet_loss_matches_reference_formula(rng):
    feats = rng.normal(size=(8, 4)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    ours = float(batch_hard_triplet(jnp.asarray(feats), jnp.asarray(labels)))

    # reference batch-hard soft-margin formula (triplet_loss.py)
    d = np.sqrt(np.maximum(
        ((feats[:, None] - feats[None, :]) ** 2).sum(-1), 1e-12))
    same = labels[:, None] == labels[None, :]
    d_ap = np.max(np.where(same, d, -np.inf), axis=1)
    d_an = np.min(np.where(same, np.inf, d), axis=1)
    ref = np.mean(np.log1p(np.exp(d_ap - d_an)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cross_entropy_label_smoothing(rng):
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    labels = np.array([0, 2, 4, 5])
    import torch
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), label_smoothing=0.1)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_pk_sampler_batch_structure():
    samples = [ReIDSample("r", "d", pid=i // 7) for i in range(35)]  # 5 ids x 7
    sampler = PKSampler(samples, batch_size=8, num_instances=4, seed=0)
    batches = sampler.epoch_batches(epoch=0)
    assert batches
    for batch in batches:
        assert len(batch) == 8
        pids = [samples[i].pid for i in batch]
        unique, counts = np.unique(pids, return_counts=True)
        assert len(unique) == 2 and (counts == 4).all()
    # determinism across "hosts"
    assert sampler.epoch_batches(0) == PKSampler(samples, 8, 4, 0).epoch_batches(0)
    assert sampler.epoch_batches(0) != sampler.epoch_batches(1)


def test_cmc_map_perfect_and_random(rng):
    # clustered gallery: same-pid features are close -> near-perfect CMC/mAP
    centers = rng.normal(size=(5, 8)).astype(np.float32) * 5
    g_pids = np.arange(20) % 5
    g = centers[g_pids] + rng.normal(size=(20, 8)).astype(np.float32) * 0.01
    q_pids = np.arange(5)
    q = centers[q_pids] + rng.normal(size=(5, 8)).astype(np.float32) * 0.01
    dist = cosine_distmat(q, g)
    cmc, mAP = cmc_map(dist, q_pids, g_pids)
    assert cmc[0] == 1.0
    assert mAP > 0.99
    # random features -> poor mAP
    dist_bad = cosine_distmat(rng.normal(size=(5, 8)).astype(np.float32), g)
    _, mAP_bad = cmc_map(dist_bad, q_pids, g_pids)
    assert mAP_bad < mAP


def test_train_step_learns_tiny_task(rng):
    """LoRA-frozen FourDNet must fit a 3-class toy set in a few steps."""
    from instance_based_loc_tpu.models.dator.train import (
        TrainConfig, create_train_state, train_step)
    import dataclasses as dc
    cfg_nodrop = dc.replace(TINY_CFG, modality_dropout=False)
    tcfg = TrainConfig(base_lr=0.05, optimizer="adam", epochs=2,
                       steps_per_epoch=10, warmup_epochs=0, lora_only=True)
    state = create_train_state(cfg_nodrop, tcfg, jax.random.PRNGKey(0),
                               height=32, width=16)

    # 3 classes with distinctive rgb patterns
    labels = np.array([0, 0, 1, 1, 2, 2], np.int32)
    rgb = np.zeros((6, 32, 16, 3), np.float32)
    for i, lab in enumerate(labels):
        rgb[i, :, :, lab % 3] = 1.0 + 0.1 * i
    depth = rng.normal(size=(6, 32, 16, 3)).astype(np.float32) * 0.1

    import functools
    step = jax.jit(functools.partial(train_step, train_cfg=tcfg))
    losses = []
    for i in range(60):
        state, metrics = step(state, jnp.asarray(rgb), jnp.asarray(depth),
                              jnp.asarray(labels), jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert float(metrics["acc"]) > 0.5


def test_lora_only_mask_freezes_towers():
    from instance_based_loc_tpu.models.dator.train import (
        TrainConfig, create_train_state, train_step)
    tcfg = TrainConfig(base_lr=0.1, optimizer="sgd", epochs=1,
                       steps_per_epoch=1, warmup_epochs=0, lora_only=True)
    state = create_train_state(TINY_CFG, tcfg, jax.random.PRNGKey(0),
                               height=32, width=16)
    before = np.asarray(state.params["params"]["towers"]["patch_embed"]["kernel"])
    rgb = jnp.ones((4, 32, 16, 3))
    depth = jnp.ones((4, 32, 16, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    state, _ = train_step(state, rgb, depth, labels, jax.random.PRNGKey(0), tcfg)
    after = np.asarray(state.params["params"]["towers"]["patch_embed"]["kernel"])
    np.testing.assert_array_equal(before, after)  # frozen backbone


def test_quantized_batch_matches_f32_path(tmp_path, rng):
    """load_batch(quantize=True) + device dequantize must reproduce the f32
    preprocessing within input quantization (u8 rgb exact, u16 depth
    <=2/65535 after normalization), and train_step must accept either."""
    from PIL import Image
    from instance_based_loc_tpu.models.dator.data import PKSampler, scan_instance_dirs
    from instance_based_loc_tpu.models.dator.train import (
        TrainConfig, create_train_state, dequantize_batch, train_step)

    for pid in range(2):
        d = tmp_path / f"obj_{pid}"
        d.mkdir()
        for i in range(2):
            arr = (rng.random((40, 24, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"s{i}_rgb.png")
            np.save(d / f"s{i}_depth.npy",
                    (rng.random((40, 24)) * 8).astype(np.float32))
    samples = scan_instance_dirs(str(tmp_path))
    sampler = PKSampler(samples, batch_size=4, num_instances=2)
    idxs = list(range(4))

    rgb_f, dep_f, pids_f = sampler.load_batch(idxs, 32, 16)
    rgb_q, dep_q, pids_q = sampler.load_batch(idxs, 32, 16, quantize=True)
    assert rgb_q.dtype == np.uint8 and dep_q.dtype == np.uint16
    assert dep_q.shape == (4, 32, 16)
    np.testing.assert_array_equal(pids_f, pids_q)
    rgb_d, dep_d = dequantize_batch(jnp.asarray(rgb_q), jnp.asarray(dep_q))
    np.testing.assert_allclose(np.asarray(rgb_d), rgb_f, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dep_d), dep_f, atol=2.0 / 65535 + 1e-6)

    tcfg = TrainConfig(base_lr=0.01, optimizer="sgd", epochs=1,
                       steps_per_epoch=1, warmup_epochs=0)
    state = create_train_state(TINY_CFG, tcfg, jax.random.PRNGKey(0),
                               height=32, width=16)
    _, m_q = train_step(state, jnp.asarray(rgb_q), jnp.asarray(dep_q),
                        jnp.asarray(pids_q), jax.random.PRNGKey(0), tcfg)
    _, m_f = train_step(state, jnp.asarray(rgb_f), jnp.asarray(dep_f),
                        jnp.asarray(pids_f), jax.random.PRNGKey(0), tcfg)
    np.testing.assert_allclose(float(m_q["loss"]), float(m_f["loss"]),
                               rtol=1e-3, atol=1e-3)
