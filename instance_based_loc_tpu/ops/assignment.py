"""Detection -> memory assignment search.

Replaces reference `utils/similarity_volume.py` (SimVolume): the reference
builds, for every C(D, k) subset of detections (k = min(D, 3)), a dense
(M+1)^k "volume" whose entry [i1..ik] is the product of the chosen
similarities (index M = "unassigned", similarity 1), masks non-injective
assignments to -inf via explicit permutation enumeration
(similarity_volume.py:126-154), then pops argmaxes one at a time
(:213-270).

TPU-native design: the volume IS a broadcast outer product, the injectivity
mask IS a pairwise index comparison, and the argmax-pop loop IS a single
`lax.top_k` over the flattened volume — one fused kernel for ALL subsets at
once (vmapped over the C(D,k) subset axis). The tiny final selection
(dedup, top-per-assignment-length) stays on host, matching the reference's
selection rules (`get_top_indices_from_subvolumes`: pop
num_per_length * D * 4 per subvolume, dedup, keep top max(1, L) per length L).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -jnp.inf


@partial(jax.jit, static_argnames=("k", "topk"))
def _subvolume_topk(rows: jax.Array, mem_valid: jax.Array, k: int, topk: int):
    """For each subset (batched leading axis S):

    rows: (S, k, M+1) similarity rows (+ trailing "unassigned" column = 1).
    mem_valid: (M+1,) — False marks padded memory slots (never assignable);
        the unassigned column is always valid.

    Returns (values (S, topk), flat_indices (S, topk)) of the best injective
    assignments per subvolume, where flat indices unravel into k coordinates
    in base (M+1).
    """
    m1 = rows.shape[-1]

    def one(sub_rows):
        # outer product volume, built by successive broadcasting
        vol = sub_rows[0]
        for i in range(1, k):
            vol = vol[..., None] * sub_rows[i]
        # injectivity mask: no two coordinates may equal the same *real* index
        shape = (m1,) * k
        coords = [jax.lax.broadcasted_iota(jnp.int32, shape, d) for d in range(k)]
        bad = jnp.zeros(shape, bool)
        for a in range(k):
            for b in range(a + 1, k):
                bad |= (coords[a] == coords[b]) & (coords[a] != m1 - 1)
        # padded memory slots are unassignable
        for a in range(k):
            bad |= ~mem_valid[coords[a]]
        # at least one real assignment
        all_unassigned = jnp.ones(shape, bool)
        for a in range(k):
            all_unassigned &= coords[a] == m1 - 1
        bad |= all_unassigned
        vol = jnp.where(bad, NEG_INF, vol)
        return jax.lax.top_k(vol.reshape(-1), topk)

    return jax.vmap(one)(rows)


class SimVolume:
    """API-compatible with the reference SimVolume for the paths the pipeline
    uses (`fast_construct_volume` + `get_top_indices_from_subvolumes` —
    object_memory.py:974-984), but the volume construction/top-k runs as one
    batched device kernel."""

    def __init__(self, cosine_similarities: np.ndarray):
        sims = np.asarray(cosine_similarities, np.float32)
        assert sims.ndim == 2
        self.sims = sims
        d, m = sims.shape
        aug = np.ones((d, m + 1), np.float32)
        aug[:, :-1] = sims
        self.aug = aug
        self._subsets: list[tuple[int, ...]] | None = None
        self._topk_vals: np.ndarray | None = None
        self._topk_idx: np.ndarray | None = None
        self._k: int | None = None

    def fast_construct_volume(self, subvolume_size: int,
                              num_per_length: int = 4) -> None:
        d, m1 = self.aug.shape
        k = min(subvolume_size, d)
        assert d >= 1
        self._k = k
        self._subsets = list(itertools.combinations(range(d), k))
        rows = jnp.asarray(self.aug[np.array(self._subsets)])  # (S, k, M+1)
        mem_valid = jnp.ones((m1,), bool)
        # pop budget per subvolume (reference: num_per_length * D * 4)
        budget = min(num_per_length * d * 4, m1 ** k)
        vals, idx = _subvolume_topk(rows, mem_valid, k, budget)
        self._topk_vals = np.asarray(vals)
        self._topk_idx = np.asarray(idx)

    def get_top_indices_from_subvolumes(self, num_per_length: int = 3):
        """Reference selection rules (similarity_volume.py:213-270): gather all
        popped entries, convert to (detection, memory) pair lists dropping
        "unassigned" coordinates, dedup, then keep the top max(1, L) by score
        for each assignment length L in 1..D."""
        assert self._topk_vals is not None, "call fast_construct_volume first"
        d, m1 = self.aug.shape
        unassigned = m1 - 1
        k = self._k

        entries = []  # (assignment tuple, score)
        for subset, vals, idxs in zip(self._subsets, self._topk_vals, self._topk_idx):
            coords = np.stack(np.unravel_index(idxs, (m1,) * k), axis=-1)  # (B, k)
            for val, coord in zip(vals, coords):
                if not np.isfinite(val):
                    continue
                assn = [[det, int(mem)] for det, mem in zip(subset, coord)
                        if mem != unassigned]
                if not assn:
                    continue
                entries.append((assn, float(val)))

        seen = []
        deduped = []
        for assn, val in entries:
            key = tuple(map(tuple, assn))
            if key in seen:
                continue
            seen.append(key)
            deduped.append((assn, val))

        selected = []
        for length in range(1, d + 1):
            of_len = [e for e in deduped if len(e[0]) == length]
            of_len.sort(key=lambda e: e[1], reverse=True)
            selected += of_len[: max(1, length)]

        return [assn for assn, _ in selected]


def top_assignments(closest_similarities: np.ndarray,
                    subvolume_size: int = 3,
                    num_per_length: int = 4) -> list[list[list[int]]]:
    """One-call wrapper used by the localiser (object_memory.py:974-984)."""
    sv = SimVolume(closest_similarities)
    sv.fast_construct_volume(min(len(closest_similarities), subvolume_size),
                             num_per_length=num_per_length)
    return sv.get_top_indices_from_subvolumes(num_per_length=num_per_length)
