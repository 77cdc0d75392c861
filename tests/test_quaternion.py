import jax
import jax.numpy as jnp
import numpy as np
import pytest

from steppingstone_tpu.core import quaternion as qt


def rand_unit_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return qt.normalize(q)


def test_identity_rotate():
    v = jnp.array([1.0, 2.0, 3.0])
    assert np.allclose(qt.rotate(qt.identity(), v), v)


def test_mul_matches_matrix_product():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a, b = rand_unit_quat(k1), rand_unit_quat(k2)
    Rab = qt.to_matrix(qt.mul(a, b))
    Ra_Rb = qt.to_matrix(a) @ qt.to_matrix(b)
    assert np.allclose(Rab, Ra_Rb, atol=1e-6)


def test_rotate_matches_matrix():
    key = jax.random.PRNGKey(1)
    q = rand_unit_quat(key, (5,))
    v = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    got = qt.rotate(q, v)
    want = jnp.einsum("bij,bj->bi", qt.to_matrix(q), v)
    assert np.allclose(got, want, atol=1e-6)


def test_inv_roundtrip():
    q = rand_unit_quat(jax.random.PRNGKey(3), (7,))
    v = jax.random.normal(jax.random.PRNGKey(4), (7, 3))
    assert np.allclose(qt.rotate_inv(q, qt.rotate(q, v)), v, atol=1e-5)


def test_axis_angle():
    # 90 deg about z sends x to y
    q = qt.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
    v = qt.rotate(q, jnp.array([1.0, 0.0, 0.0]))
    assert np.allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_euler_roundtrip():
    yaw, pitch, roll = 0.7, -0.3, 0.2
    q = qt.from_euler_zyx(jnp.array(yaw), jnp.array(pitch), jnp.array(roll))
    y2, p2, r2 = qt.to_euler_zyx(q)
    assert np.allclose([y2, p2, r2], [yaw, pitch, roll], atol=1e-6)


def test_integrate_constant_omega():
    # Integrating omega_z = w for time t should give rotation w*t about z.
    w = 2.0
    dt = 1e-4
    n = 2000
    q = qt.identity()
    omega = jnp.array([0.0, 0.0, w])

    def body(q, _):
        return qt.integrate(q, omega, dt), None

    q, _ = jax.lax.scan(body, q, None, length=n)
    expected = qt.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(w * dt * n))
    assert np.allclose(q, expected, atol=1e-4)


def test_heading():
    q = qt.from_euler_zyx(jnp.array(1.1), jnp.array(0.0), jnp.array(0.0))
    assert np.allclose(qt.heading(q), 1.1, atol=1e-6)
