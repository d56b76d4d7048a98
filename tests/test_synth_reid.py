"""gen_synth_reid: reference-layout procedural ReID data (VERDICT r2 #5).
Checks the dir-per-instance contract against the dator scanner, split
sizes, determinism, and that identity signal actually exists (same-id
samples are closer than cross-id in raw feature space — the dataset is a
learnable ReID task, not noise)."""

import numpy as np

from instance_based_loc_tpu.cli.gen_synth_reid import generate
from instance_based_loc_tpu.models.dator.data import (scan_instance_dirs,
                                                      preprocess_rgb)


def _features(samples, n):
    from PIL import Image
    feats, pids = [], []
    for s in samples[:n]:
        rgb = np.asarray(Image.open(s.rgb_path))
        f = preprocess_rgb(rgb, 32, 16).reshape(-1)
        feats.append(f / (np.linalg.norm(f) + 1e-9))
        pids.append(s.pid)
    return np.stack(feats), np.asarray(pids)


def test_generate_layout_and_identity_signal(tmp_path):
    out = str(tmp_path / "reid")
    n = generate(out, ids=6, train_per_id=5, val_per_id=2, test_per_id=1,
                 h=96, w=48, seed=3)
    assert n == 6 * 8
    train = scan_instance_dirs(out + "/train")
    assert len(train) == 30
    assert len({s.pid for s in train}) == 6
    assert len(scan_instance_dirs(out + "/val")) == 12
    assert len(scan_instance_dirs(out + "/test")) == 6

    d = np.load(train[0].depth_path)
    assert d.dtype == np.float32 and d.min() > 0 and d.max() < 50

    feats, pids = _features(train, 30)
    sims = feats @ feats.T
    same = sims[pids[:, None] == pids[None, :]]
    same = same[same < 0.9999]          # drop self-pairs
    diff = sims[pids[:, None] != pids[None, :]]
    assert same.mean() > diff.mean() + 0.05, (same.mean(), diff.mean())


def test_generate_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        generate(out, ids=2, train_per_id=2, val_per_id=1, test_per_id=1,
                 h=64, w=32, seed=7)
    for rel in ("train/id_0001/s001_rgb.png", "val/id_0000/s000_depth.npy"):
        pa, pb = f"{a}/{rel}", f"{b}/{rel}"
        if rel.endswith("npy"):
            np.testing.assert_array_equal(np.load(pa), np.load(pb))
        else:
            from PIL import Image
            np.testing.assert_array_equal(np.asarray(Image.open(pa)),
                                          np.asarray(Image.open(pb)))
