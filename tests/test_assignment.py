"""Assignment-search invariants, ported from the reference's only real test
suite (`TestSimVolume`, similarity_volume.py:274-385): volume entries equal
row products, repeated/real-index collisions are excluded, the all-unassigned
assignment is excluded — plus brute-force agreement of the device top-k."""

import itertools

import numpy as np
import jax.numpy as jnp

from instance_based_loc_tpu.ops.assignment import (
    SimVolume, _subvolume_topk, top_assignments)


def brute_force_best(sims, k, subset):
    """Enumerate all injective partial assignments of `subset` and score by
    product (unassigned contributes factor 1, all-unassigned excluded)."""
    d, m = sims.shape
    best = []
    for choice in itertools.product(range(m + 1), repeat=k):
        real = [c for c in choice if c != m]
        if len(set(real)) != len(real):
            continue
        if not real:
            continue
        score = 1.0
        for det, c in zip(subset, choice):
            if c != m:
                score *= sims[det, c]
        best.append((choice, score))
    best.sort(key=lambda x: x[1], reverse=True)
    return best


def test_subvolume_topk_matches_bruteforce(rng):
    sims = rng.uniform(0.1, 1.0, size=(3, 5)).astype(np.float32)
    aug = np.ones((3, 6), np.float32)
    aug[:, :5] = sims
    rows = jnp.asarray(aug[None])  # one subset = all three detections
    vals, idx = _subvolume_topk(rows, jnp.ones(6, bool), k=3, topk=10)
    got = [(tuple(np.unravel_index(int(i), (6, 6, 6))), float(v))
           for v, i in zip(np.asarray(vals)[0], np.asarray(idx)[0])]
    expect = brute_force_best(sims, 3, (0, 1, 2))[:10]
    for (gc, gv), (ec, ev) in zip(got, expect):
        np.testing.assert_allclose(gv, ev, rtol=1e-5)


def test_volume_entry_is_product(rng):
    """Reference TestSimVolume.test_vol invariant."""
    sims = rng.uniform(0.1, 1.0, size=(3, 4)).astype(np.float32)
    aug = np.ones((3, 5), np.float32)
    aug[:, :4] = sims
    rows = jnp.asarray(aug[None])
    vals, idx = _subvolume_topk(rows, jnp.ones(5, bool), k=3, topk=125)
    flat = {int(i): float(v) for v, i in zip(np.asarray(vals)[0], np.asarray(idx)[0])}
    for choice in itertools.product(range(5), repeat=3):
        flat_i = np.ravel_multi_index(choice, (5, 5, 5))
        real = [c for c in choice if c != 4]
        expected_invalid = (len(set(real)) != len(real)) or len(real) == 0
        got = flat.get(int(flat_i))
        if expected_invalid:
            # -inf entries are excluded from top-k or reported as -inf
            assert got is None or not np.isfinite(got)
        else:
            prod = np.prod([sims[d, c] for d, c in zip(range(3), choice) if c != 4],
                           dtype=np.float64) if real else 1.0
            assert got is not None
            np.testing.assert_allclose(got, prod, rtol=1e-4)


def test_repeated_assignments_excluded(rng):
    sims = rng.uniform(0.5, 1.0, size=(2, 3)).astype(np.float32)
    sv = SimVolume(sims)
    sv.fast_construct_volume(2)
    assns = sv.get_top_indices_from_subvolumes()
    for assn in assns:
        mems = [m for _, m in assn]
        assert len(set(mems)) == len(mems), f"repeat in {assn}"
        assert len(assn) >= 1


def test_top_assignment_is_argmax_row(rng):
    # one detection: best assignment must be its argmax memory object
    sims = np.array([[0.1, 0.9, 0.3]], np.float32)
    assns = top_assignments(sims)
    assert assns[0] == [[0, 1]]


def test_selection_per_length_rules(rng):
    """Reference keeps top max(1, L) assignments per length L (:248-253)."""
    sims = rng.uniform(0.1, 1.0, size=(4, 6)).astype(np.float32)
    sv = SimVolume(sims)
    sv.fast_construct_volume(3)
    assns = sv.get_top_indices_from_subvolumes(num_per_length=4)
    by_len = {}
    for a in assns:
        by_len.setdefault(len(a), []).append(a)
    for length, group in by_len.items():
        assert len(group) <= max(1, length)
    # dedup
    keys = [tuple(map(tuple, a)) for a in assns]
    assert len(keys) == len(set(keys))


def test_single_detection_path():
    sims = np.array([[0.3, 0.8]], np.float32)
    sv = SimVolume(sims)
    sv.fast_construct_volume(3)  # k clamps to 1
    assns = sv.get_top_indices_from_subvolumes()
    assert assns[0] == [[0, 1]]


def test_negative_similarities(rng):
    """Products of raw cosine sims can be negative; ordering must still hold."""
    sims = np.array([[-0.5, 0.2], [0.9, -0.1]], np.float32)
    assns = top_assignments(sims)
    # best length-2: products: (0->0,1->1): -0.5*-0.1=0.05; (0->1,1->0): 0.2*0.9=0.18
    assert [[0, 1], [1, 0]] in assns
