"""Analytic 3x3 eigh/SVD vs numpy (the TPU-fast replacement for iterative
LAPACK-style decompositions in Kabsch/normals/OBB/ellipsoid)."""

import numpy as np
import jax.numpy as jnp

from instance_based_loc_tpu.ops.eigen3 import eigh3x3, svd3x3


def test_eigh3x3_random(rng):
    a = rng.normal(size=(500, 3, 3)).astype(np.float32)
    sym = 0.5 * (a + a.transpose(0, 2, 1))
    w, v = map(np.asarray, eigh3x3(jnp.asarray(sym)))
    w_ref = np.linalg.eigvalsh(sym)
    np.testing.assert_allclose(w, w_ref, atol=2e-4)
    # A v = w v  and orthonormal columns
    av = np.einsum("nij,njk->nik", sym, v)
    wv = w[:, None, :] * v
    np.testing.assert_allclose(av, wv, atol=5e-3)
    eye = np.einsum("nji,njk->nik", v, v)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=2e-4)


def test_eigh3x3_degenerate():
    # repeated eigenvalues: identity and rank-1
    mats = np.stack([np.eye(3),
                     np.diag([2.0, 2.0, 5.0]),
                     np.outer([1, 1, 1], [1, 1, 1]).astype(float)])
    w, v = map(np.asarray, eigh3x3(jnp.asarray(mats, jnp.float32)))
    for i in range(len(mats)):
        av = mats[i] @ v[i]
        wv = v[i] * w[i][None, :]
        np.testing.assert_allclose(av, wv, atol=1e-4)
        np.testing.assert_allclose(v[i].T @ v[i], np.eye(3), atol=1e-4)


def test_svd3x3_reconstruction(rng):
    a = rng.normal(size=(500, 3, 3)).astype(np.float32)
    u, s, vt = map(np.asarray, svd3x3(jnp.asarray(a)))
    rec = np.einsum("nij,nj,njk->nik", u, s, vt)
    np.testing.assert_allclose(rec, a, atol=5e-4)
    s_ref = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(s, s_ref, atol=2e-4)
    # orthogonality
    np.testing.assert_allclose(np.einsum("nji,njk->nik", u, u),
                               np.broadcast_to(np.eye(3), u.shape), atol=3e-4)


def test_svd3x3_negative_det_and_rank_deficient(rng):
    mats = [np.diag([1.0, 2.0, -3.0]),
            np.diag([1.0, 1.0, 0.0]),
            np.zeros((3, 3))]
    for m in mats:
        u, s, vt = map(np.asarray, svd3x3(jnp.asarray(m[None], jnp.float32)))
        rec = u[0] @ np.diag(s[0]) @ vt[0]
        np.testing.assert_allclose(rec, m, atol=1e-4)
        assert (s[0] >= -1e-6).all()
