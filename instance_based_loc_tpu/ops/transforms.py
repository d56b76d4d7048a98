"""Pose / quaternion math as pure JAX (replaces scipy.spatial.transform.Rotation
and the reference's numpy QuaternionOps).

Conventions (kept bit-compatible with the reference):

* Poses are 7-vectors ``[x, y, z, qx, qy, qz, qw]`` — scipy "xyzw" quaternion
  order, as used throughout the reference (`utils/depth_utils.py:96-102`,
  dataloaders, trial scripts).
* ``transform_pointcloud`` applies ``(R @ P.T).T + t``
  (reference `utils/depth_utils.py:92-116`).
* ``transform_pointcloud_kinect`` pre-rotates by euler ``[0, pi, 0]`` and
  *subtracts* t — the TUM Kinect frame fix (`utils/depth_utils.py:118-144`).
* ``quaternion_error`` reproduces reference `utils/quaternion_ops.py:16-25`
  including its component-order quirks: the input 4-vector is unpacked as
  ``w, x, y, z`` (so callers passing xyzw get the same numbers the reference
  trial scripts got).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# quaternion <-> rotation matrix (scipy xyzw convention)
# --------------------------------------------------------------------------- #
def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_xyzw_to_rotmat(q: jax.Array) -> jax.Array:
    """Rotation matrix from an xyzw quaternion. Matches
    `scipy.spatial.transform.Rotation.from_quat(q).as_matrix()`."""
    q = quat_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat_xyzw(m: jax.Array) -> jax.Array:
    """xyzw quaternion from rotation matrix; matches scipy's
    `Rotation.from_matrix(m).as_quat()` up to sign (q and -q are the same
    rotation). Branch-free Shepperd-style construction."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    t0 = 1.0 + m00 + m11 + m22  # = 4w^2
    t1 = 1.0 + m00 - m11 - m22  # = 4x^2
    t2 = 1.0 - m00 + m11 - m22  # = 4y^2
    t3 = 1.0 - m00 - m11 + m22  # = 4z^2

    # Each candidate is (x, y, z, w) scaled by a positive factor, so picking
    # the best-conditioned one and normalizing gives the exact quaternion.
    cand_w = jnp.stack([m21 - m12, m02 - m20, m10 - m01, t0], axis=-1)
    cand_x = jnp.stack([t1, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    cand_y = jnp.stack([m01 + m10, t2, m12 + m21, m02 - m20], axis=-1)
    cand_z = jnp.stack([m02 + m20, m12 + m21, t3, m10 - m01], axis=-1)

    scores = jnp.stack([t1, t2, t3, t0], axis=-1)
    choice = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([cand_x, cand_y, cand_z, cand_w], axis=-2)
    idx = jnp.broadcast_to(choice[..., None, None], choice.shape + (1, 4))
    q = jnp.take_along_axis(cands, idx, axis=-2).squeeze(-2)
    return quat_normalize(q)


def euler_xyz_to_rotmat(euler: jax.Array, degrees: bool = False) -> jax.Array:
    """Extrinsic xyz euler angles -> rotation matrix; matches
    `scipy Rotation.from_euler('xyz', e)` (extrinsic: R = Rz @ Ry @ Rx)."""
    if degrees:
        euler = euler * (jnp.pi / 180.0)
    cx, cy, cz = jnp.cos(euler[..., 0]), jnp.cos(euler[..., 1]), jnp.cos(euler[..., 2])
    sx, sy, sz = jnp.sin(euler[..., 0]), jnp.sin(euler[..., 1]), jnp.sin(euler[..., 2])
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    rx = jnp.stack([one, zero, zero,
                    zero, cx, -sx,
                    zero, sx, cx], axis=-1).reshape(euler.shape[:-1] + (3, 3))
    ry = jnp.stack([cy, zero, sy,
                    zero, one, zero,
                    -sy, zero, cy], axis=-1).reshape(euler.shape[:-1] + (3, 3))
    rz = jnp.stack([cz, -sz, zero,
                    sz, cz, zero,
                    zero, zero, one], axis=-1).reshape(euler.shape[:-1] + (3, 3))
    return rz @ ry @ rx


def euler_xyz_to_quat_xyzw(euler: jax.Array, degrees: bool = False) -> jax.Array:
    return rotmat_to_quat_xyzw(euler_xyz_to_rotmat(euler, degrees=degrees))


# --------------------------------------------------------------------------- #
# pose application (reference depth_utils.py:92-144)
# --------------------------------------------------------------------------- #
def transform_points(points: jax.Array, pose7: jax.Array) -> jax.Array:
    """Apply pose [t(3), q_xyzw(4)]: ``(R @ P.T).T + t``."""
    t, q = pose7[:3], pose7[3:]
    r = quat_xyzw_to_rotmat(q)
    from .distance import matmul_hp
    return matmul_hp(points, r.T) + t


def transform_points_kinect(points: jax.Array, pose7: jax.Array) -> jax.Array:
    """TUM Kinect-frame variant: pre-rotate by euler [0, pi, 0], negate t
    (reference `utils/depth_utils.py:118-144`)."""
    t, q = pose7[:3], pose7[3:]
    r = quat_xyzw_to_rotmat(q)
    r2 = euler_xyz_to_rotmat(jnp.array([0.0, jnp.pi, 0.0]))
    from .distance import matmul_hp
    return matmul_hp(points, (r @ r2).T) - t


def transform_pointcloud(cloud, pose7: jax.Array):
    """PointCloud version of `transform_points` (mask/colors pass through)."""
    from .pointcloud import PointCloud
    return PointCloud(transform_points(cloud.points, pose7), cloud.colors, cloud.mask)


def transform_pointcloud_kinect(cloud, pose7: jax.Array):
    from .pointcloud import PointCloud
    return PointCloud(transform_points_kinect(cloud.points, pose7), cloud.colors, cloud.mask)


def decompose_pose_matrix(pose_matrix: jax.Array) -> jax.Array:
    """4x4 homogeneous matrix -> 7-vec [t, q_xyzw]
    (reference `utils/depth_utils.py:279-288`)."""
    t = pose_matrix[:3, 3]
    q = rotmat_to_quat_xyzw(pose_matrix[:3, :3])
    return jnp.concatenate([t, q])


def compose_pose_matrix(r: jax.Array, t: jax.Array) -> jax.Array:
    m = jnp.eye(4, dtype=r.dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m


# --------------------------------------------------------------------------- #
# quaternion algebra (reference utils/quaternion_ops.py — wxyz unpack order)
# --------------------------------------------------------------------------- #
def quaternion_multiply_wxyz(q1: jax.Array, q2: jax.Array) -> jax.Array:
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quaternion_conjugate_wxyz(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_error(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Geodesic angle between two quaternions, exactly as the reference
    computes it (`utils/quaternion_ops.py:20-25`): min over q2 / -q2 of
    |atan2(|vec(dq)|, scalar(dq))| with wxyz unpack order."""
    q_del = quaternion_multiply_wxyz(quaternion_conjugate_wxyz(q1), q2)
    q_del_neg = quaternion_multiply_wxyz(quaternion_conjugate_wxyz(q1), -q2)
    a = jnp.abs(jnp.arctan2(jnp.linalg.norm(q_del[..., 1:], axis=-1), q_del[..., 0]))
    b = jnp.abs(jnp.arctan2(jnp.linalg.norm(q_del_neg[..., 1:], axis=-1), q_del_neg[..., 0]))
    return jnp.minimum(a, b)
