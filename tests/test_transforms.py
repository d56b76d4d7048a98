"""Quaternion / pose math vs scipy references (reference utils/quaternion_ops.py,
utils/depth_utils.py pose paths)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from instance_based_loc_tpu.ops import transforms as T


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy(rng):
    q = random_quats(rng, 64)
    ours = np.asarray(T.quat_xyzw_to_rotmat(jnp.asarray(q)))
    theirs = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_rotmat_to_quat_roundtrip(rng):
    q = random_quats(rng, 128)
    m = Rotation.from_quat(q).as_matrix()
    q2 = np.asarray(T.rotmat_to_quat_xyzw(jnp.asarray(m)))
    # q and -q are the same rotation
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_euler_xyz_matches_scipy(rng):
    e = rng.uniform(-np.pi, np.pi, size=(32, 3))
    ours = np.asarray(T.euler_xyz_to_rotmat(jnp.asarray(e)))
    theirs = Rotation.from_euler("xyz", e).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    ours_deg = np.asarray(T.euler_xyz_to_rotmat(jnp.asarray(np.rad2deg(e)), degrees=True))
    np.testing.assert_allclose(ours_deg, theirs, atol=1e-5)


def test_transform_points_matches_reference_math(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    t = rng.normal(size=3)
    q = random_quats(rng, 1)[0]
    pose = np.concatenate([t, q]).astype(np.float32)

    ours = np.asarray(T.transform_points(jnp.asarray(pts), jnp.asarray(pose)))
    r = Rotation.from_quat(q).as_matrix()
    theirs = (r @ pts.T).T + t  # depth_utils.py:109
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_transform_points_kinect(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    t = rng.normal(size=3)
    q = random_quats(rng, 1)[0]
    pose = np.concatenate([t, q]).astype(np.float32)

    ours = np.asarray(T.transform_points_kinect(jnp.asarray(pts), jnp.asarray(pose)))
    r = Rotation.from_quat(q).as_matrix()
    r2 = Rotation.from_euler("xyz", [0, np.pi, 0]).as_matrix()
    theirs = (r @ r2 @ pts.T).T - t  # depth_utils.py:137
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _ref_quaternion_error(q1, q2):
    """Verbatim reference math (utils/quaternion_ops.py)."""
    def qmul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])
    def conj(q):
        return np.array([q[0], -q[1], -q[2], -q[3]])
    d1 = qmul(conj(q1), q2)
    d2 = qmul(conj(q1), -q2)
    return min(abs(np.arctan2(np.linalg.norm(d1[1:]), d1[0])),
               abs(np.arctan2(np.linalg.norm(d2[1:]), d2[0])))


def test_quaternion_error_matches_reference(rng):
    for _ in range(20):
        q1 = random_quats(rng, 1)[0]
        q2 = random_quats(rng, 1)[0]
        ours = float(T.quaternion_error(jnp.asarray(q1), jnp.asarray(q2)))
        theirs = _ref_quaternion_error(q1, q2)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_decompose_pose_matrix(rng):
    q = random_quats(rng, 1)[0]
    t = rng.normal(size=3)
    m = np.eye(4)
    m[:3, :3] = Rotation.from_quat(q).as_matrix()
    m[:3, 3] = t
    out = np.asarray(T.decompose_pose_matrix(jnp.asarray(m)))
    np.testing.assert_allclose(out[:3], t, atol=1e-6)
    assert abs(np.dot(out[3:], q)) > 1 - 1e-6
