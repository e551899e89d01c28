"""Quaternion / continuous-6D rotation algebra in JAX.

Capability match of ``text2motion/utils/quaternion.py`` (QuaterNet lineage):
wxyz convention, batch-agnostic over leading dims, every op jit/vmap/grad
compatible. The reference keeps separate ``_np`` wrappers for numpy inputs
(``quaternion.py:23-26,128-147``); here the single jnp implementation serves
both (jnp consumes numpy arrays directly), so the `_np` family is dropped.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of unit quaternion(s) (``quaternion.py:16-20``)."""
    assert q.shape[-1] == 4, "q must have shape (*, 4)"
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit length (``quaternion.py:28-30``)."""
    assert q.shape[-1] == 4
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*r, shape (*, 4) (``quaternion.py:33-51``)."""
    assert q.shape[-1] == 4 and r.shape[-1] == 4
    qw, qx, qy, qz = jnp.split(q, 4, axis=-1)
    rw, rx, ry, rz = jnp.split(r, 4, axis=-1)
    w = qw * rw - qx * rx - qy * ry - qz * rz
    x = qw * rx + qx * rw + qy * rz - qz * ry
    y = qw * ry - qx * rz + qy * rw + qz * rx
    z = qw * rz + qx * ry - qy * rx + qz * rw
    return jnp.concatenate([w, x, y, z], axis=-1)


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (``quaternion.py:54-73``).

    Rodrigues form: v + 2*(w*(qvec x v) + qvec x (qvec x v)).
    """
    assert q.shape[-1] == 4 and v.shape[-1] == 3
    qvec = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2 * (w * uv + uuv)


def qbetween(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating v0 onto v1 (``quaternion.py:387-398``)."""
    assert v0.shape[-1] == 3 and v1.shape[-1] == 3
    v = jnp.cross(v0, v1)
    w = jnp.sqrt((v0 ** 2).sum(axis=-1, keepdims=True)
                 * (v1 ** 2).sum(axis=-1, keepdims=True)) \
        + (v0 * v1).sum(axis=-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def qfix(q: np.ndarray) -> np.ndarray:
    """Enforce sign continuity along the time axis, shape (L, J, 4)
    (``quaternion.py:149-166``). Host-side numpy — used only in dataset
    preprocessing, never in the jitted path."""
    assert q.ndim == 3 and q.shape[-1] == 4
    result = np.array(q, copy=True)
    dot_products = np.sum(q[1:] * q[:-1], axis=2)
    mask = dot_products < 0
    mask = (np.cumsum(mask, axis=0) % 2).astype(bool)
    result[1:][mask] *= -1
    return result


def qeuler(q: jnp.ndarray, order: str, epsilon: float = 0.0,
           deg: bool = True) -> jnp.ndarray:
    """Quaternion -> Euler angles (``quaternion.py:76-126``)."""
    assert q.shape[-1] == 4
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    clip = lambda x: jnp.clip(x, -1 + epsilon, 1 - epsilon)
    if order == "xyz":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(clip(2 * (q1 * q3 + q0 * q2)))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "yzx":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = jnp.arcsin(clip(2 * (q1 * q2 + q0 * q3)))
    elif order == "zxy":
        x = jnp.arcsin(clip(2 * (q0 * q1 + q2 * q3)))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "xzy":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = jnp.arcsin(clip(2 * (q0 * q3 - q1 * q2)))
    elif order == "yxz":
        x = jnp.arcsin(clip(2 * (q0 * q1 - q2 * q3)))
        y = jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "zyx":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(clip(2 * (q0 * q2 - q1 * q3)))
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise ValueError(f"unknown euler order: {order}")
    e = jnp.stack([x, y, z], axis=-1)
    return e * 180.0 / jnp.pi if deg else e


def euler2quat(e: jnp.ndarray, order: str, deg: bool = True) -> jnp.ndarray:
    """Euler angles -> quaternion (``quaternion.py:169-211``)."""
    assert e.shape[-1] == 3
    if deg:
        e = e * jnp.pi / 180.0
    x, y, z = e[..., 0], e[..., 1], e[..., 2]
    zeros = jnp.zeros_like(x)
    rx = jnp.stack([jnp.cos(x / 2), jnp.sin(x / 2), zeros, zeros], axis=-1)
    ry = jnp.stack([jnp.cos(y / 2), zeros, jnp.sin(y / 2), zeros], axis=-1)
    rz = jnp.stack([jnp.cos(z / 2), zeros, zeros, jnp.sin(z / 2)], axis=-1)
    rs = {"x": rx, "y": ry, "z": rz}
    result = None
    for coord in order:
        result = rs[coord] if result is None else qmul(result, rs[coord])
    if order in ("xyz", "yzx", "zxy"):
        result = result * -1
    return result


def expmap_to_quaternion(e: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> quaternion, stable sinc form (``quaternion.py:214-230``)."""
    assert e.shape[-1] == 3
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion -> 3x3 rotation matrix (``quaternion.py:274-300``)."""
    r, i, j, k = (quaternions[..., 0], quaternions[..., 1],
                  quaternions[..., 2], quaternions[..., 3])
    two_s = 2.0 / (quaternions * quaternions).sum(-1)
    o = jnp.stack([
        1 - two_s * (j * j + k * k),
        two_s * (i * j - k * r),
        two_s * (i * k + j * r),
        two_s * (i * j + k * r),
        1 - two_s * (i * i + k * k),
        two_s * (j * k - i * r),
        two_s * (i * k - j * r),
        two_s * (j * k + i * r),
        1 - two_s * (i * i + j * j),
    ], axis=-1)
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def quaternion_to_cont6d(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> continuous 6D (first two matrix columns)
    (``quaternion.py:314-318``)."""
    m = quaternion_to_matrix(quaternions)
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(cont6d: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D -> rotation matrix by Gram-Schmidt
    (``quaternion.py:320-337``)."""
    assert cont6d.shape[-1] == 6, "last dim must be 6"
    x_raw = cont6d[..., 0:3]
    y_raw = cont6d[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def qpow(q0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Quaternion power q0**t via axis-angle (``quaternion.py:344-367``)."""
    q0 = qnormalize(q0)
    theta0 = jnp.arccos(jnp.clip(q0[..., 0], -1.0, 1.0))
    v0 = q0[..., 1:] / jnp.maximum(
        jnp.linalg.norm(q0[..., 1:], axis=-1, keepdims=True), 1e-12)
    if jnp.ndim(t) == 0:
        t = jnp.asarray(t)[None]
    theta = t[..., None] * theta0[None, ...]
    w = jnp.cos(theta)[..., None]
    xyz = jnp.sin(theta)[..., None] * v0[None, ...]
    return jnp.concatenate([w, xyz], axis=-1)


def qslerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation q0 -> q1 at fractions t
    (``quaternion.py:369-385``)."""
    q0 = qnormalize(q0)
    q1 = qnormalize(q1)
    q_ = qpow(qmul(q1, qinv(q0)), t)
    return qmul(q_, jnp.broadcast_to(q0[None, ...], q_.shape))


def lerp(p0: jnp.ndarray, p1: jnp.ndarray, t) -> jnp.ndarray:
    """Linear interpolation over a fraction grid (``quaternion.py:412-423``)."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = t[None]
    tb = t.reshape(t.shape + (1,) * p0.ndim)
    return p0[None, ...] + tb * (p1 - p0)[None, ...]
