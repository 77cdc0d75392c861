import jax
import jax.numpy as jnp
import numpy as np

from steppingstone_tpu.core import spatial as sp


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    u = jnp.array([0.5, -1.0, 2.0])
    assert np.allclose(sp.skew(v) @ u, jnp.cross(v, u), atol=1e-6)


def test_inertia_mul_matches_matrix():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mass = jnp.array(3.7)
    com = jax.random.normal(k1, (3,))
    A = jax.random.normal(k2, (3, 3))
    inertia_com = A @ A.T + 3 * jnp.eye(3)  # SPD
    v = jax.random.normal(k3, (6,))
    I6 = sp.inertia_matrix(mass, com, inertia_com)
    assert np.allclose(sp.inertia_mul(mass, com, inertia_com, v), I6 @ v, atol=1e-4)
    # spatial inertia is symmetric
    assert np.allclose(I6, I6.T, atol=1e-5)


def test_point_mass_kinetic_energy():
    # Point mass m at com c moving with velocity u: KE = 1/2 m u^2.
    m = jnp.array(2.0)
    c = jnp.array([1.0, -2.0, 0.5])
    u = jnp.array([0.3, 0.4, -0.2])
    # spatial velocity with w=0: v_O = u
    v = jnp.concatenate([jnp.zeros(3), u])
    I6 = sp.inertia_matrix(m, c, jnp.zeros((3, 3)))
    ke = 0.5 * v @ I6 @ v
    assert np.allclose(ke, 0.5 * 2.0 * float(u @ u), atol=1e-6)


def test_rotating_body_kinetic_energy():
    # Body spinning about its own com: KE = 1/2 w I_c w regardless of com pos.
    m = jnp.array(5.0)
    c = jnp.array([2.0, 1.0, -1.0])
    inertia_com = jnp.diag(jnp.array([0.1, 0.2, 0.3]))
    w = jnp.array([1.0, -2.0, 0.5])
    # spatial velocity of rotation about the com: v_O = -w x c ... point at O
    # has velocity v_com + w x (O - c) = 0 + w x (-c)
    v = jnp.concatenate([w, jnp.cross(w, -c)])
    ke = 0.5 * v @ sp.inertia_matrix(m, c, inertia_com) @ v
    assert np.allclose(ke, 0.5 * w @ inertia_com @ w, atol=1e-5)


def test_cross_motion_self_is_zero():
    v = jax.random.normal(jax.random.PRNGKey(1), (6,))
    assert np.allclose(sp.cross_motion(v, v), jnp.zeros(6), atol=1e-6)


def test_force_at_point_torque_balance():
    # Force at point p creates moment p x f about origin.
    f = jnp.array([0.0, 0.0, -9.8])
    p = jnp.array([1.0, 0.0, 0.0])
    fs = sp.force_at_point(f, p)
    assert np.allclose(fs[:3], jnp.cross(p, f), atol=1e-6)
    assert np.allclose(fs[3:], f, atol=1e-6)


def test_point_velocity():
    w = jnp.array([0.0, 0.0, 1.0])
    vo = jnp.array([1.0, 0.0, 0.0])
    v = jnp.concatenate([w, vo])
    p = jnp.array([0.0, 1.0, 0.0])
    # v_p = v_O + w x p = (1,0,0) + (0,0,1)x(0,1,0) = (1,0,0)+(-1,0,0) = 0
    assert np.allclose(sp.point_velocity(v, p), jnp.zeros(3), atol=1e-6)


def test_power_invariance_under_cross():
    # d/dt (v . I v) consistency: v x* (I v) has zero power along v.
    key = jax.random.PRNGKey(2)
    v = jax.random.normal(key, (6,))
    f = jax.random.normal(jax.random.PRNGKey(3), (6,))
    # v . (v x* f) == -(v x v) . f == 0
    assert np.allclose(jnp.dot(v, sp.cross_force(v, f)), 0.0, atol=1e-4)
