"""Physics engine unit tests against analytic solutions (SURVEY.md §7 test
strategy: pendulum energy, free-fall, single-contact statics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from steppingstone_tpu.core import quaternion as qt
from steppingstone_tpu.physics import dynamics as dyn
from steppingstone_tpu.physics import engine
from steppingstone_tpu.physics import kinematics as km
from steppingstone_tpu.physics.contact import ContactParams
from steppingstone_tpu.physics.model import build_model
from steppingstone_tpu.physics.robots.cassie import cassie
from steppingstone_tpu.physics.robots.walker3d import mike, walker3d

G = dyn.GRAVITY
NO_STONES = jnp.zeros((1, 6)).at[0, 2].set(-1000.0)  # far away stone


def pendulum_model(base_mass=1e4, arm_mass=1.0, length=1.0):
    bodies = [
        dict(name="base", mass=base_mass, inertia=(base_mass, base_mass, base_mass),
             root_height=2.0),
        dict(name="arm", parent="base", anchor=(0, 0, 0), axis=(0, 1, 0),
             mass=arm_mass, com=(0, 0, -length),
             inertia=(1e-6, 1e-6, 1e-6), damping=0.0, limits=(-100, 100)),
    ]
    contacts = [dict(body="arm", offset=(0, 0, -length), radius=0.01)]
    return build_model("pendulum", bodies, contacts)


def qdd_of(model, q, qd, tau_j=None, fixed_base=False):
    kin = km.forward_kinematics(model, q)
    vel = km.body_velocities(model, kin, qd)
    tau = jnp.zeros(model.ndof)
    if tau_j is not None:
        tau = tau.at[6:].set(tau_j)
    return dyn.forward_dynamics(model, kin, vel, tau, None, fixed_base=fixed_base)


@pytest.mark.parametrize("make", [walker3d, mike, cassie, pendulum_model])
def test_free_fall(make):
    """At rest with zero torques and no contact, everything falls at -g."""
    model = make() if make is not pendulum_model else pendulum_model()
    q = jnp.concatenate(
        [jnp.array([0.0, 0.0, 5.0]), qt.identity(), jnp.asarray(model.init_q_joints)]
    )
    # zero out passive springs/damping influence by zero velocity + measuring
    # only models without springs exactly; for cassie springs are at ref at q0
    qd = jnp.zeros(model.ndof)
    kin = km.forward_kinematics(model, q)
    vel = km.body_velocities(model, kin, qd)
    # counteract passive spring torque so the analytic answer is free fall
    qj = q[7:]
    spring = jnp.asarray(model.joint_stiffness) * (qj - jnp.asarray(model.joint_spring_ref))
    tau = jnp.zeros(model.ndof).at[6:].set(spring)
    qdd = dyn.forward_dynamics(model, kin, vel, tau, None)
    assert np.allclose(qdd[0:3], 0.0, atol=2e-2), qdd[0:3]        # no angular acc
    assert np.allclose(qdd[3:6], [0, 0, -G], atol=2e-2), qdd[3:6]
    assert np.allclose(qdd[6:], 0.0, atol=5e-2)


def test_pendulum_analytic_acceleration():
    """Fixed-base point-mass pendulum: qdd = -(g/L) sin(theta)."""
    model = pendulum_model()
    for theta in [0.0, 0.3, 1.0, -0.7]:
        q = jnp.concatenate(
            [jnp.array([0.0, 0.0, 2.0]), qt.identity(), jnp.array([theta])]
        )
        qd = jnp.zeros(model.ndof)
        qdd = qdd_of(model, q, qd, fixed_base=True)
        # arm hangs along -z; rotation about +y by theta swings the com to
        # (-L sin th, 0, -L cos th); gravity torque about +y = -m g L sin th
        expected = -G * np.sin(theta)
        assert np.allclose(qdd[6], expected, rtol=2e-3, atol=2e-3), (theta, qdd[6])


def test_free_base_pendulum_is_in_free_fall():
    """A pendulum hanging from an unsupported base is in free fall: the
    joint sees no gravity torque while the base accelerates at -g."""
    model = pendulum_model()
    q = jnp.concatenate([jnp.array([0.0, 0.0, 2.0]), qt.identity(), jnp.array([0.3])])
    qdd = qdd_of(model, q, jnp.zeros(model.ndof))
    assert np.allclose(qdd[5], -G, atol=2e-2)
    assert np.allclose(qdd[6], 0.0, atol=5e-3)


def total_energy(model, q, qd):
    kin = km.forward_kinematics(model, q)
    vel = km.body_velocities(model, kin, qd)
    phi = dyn.dof_axes(model, kin)
    M = dyn.mass_matrix(model, kin, phi)
    ke = 0.5 * qd @ M @ qd
    pe = jnp.sum(jnp.asarray(model.mass) * G * kin.com[:, 2])
    return ke + pe


def test_pendulum_energy_conservation():
    """Undamped fixed-base swing conserves energy to <1% over 1 s at 240 Hz."""
    model = pendulum_model()
    q0 = jnp.concatenate([jnp.array([0.0, 0.0, 2.0]), qt.identity(), jnp.array([1.2])])
    dt = 1.0 / 240.0

    def pend_energy(theta, thetad):
        # KE = 1/2 m L^2 w^2; PE = -m g L cos(theta)  (m = L = 1)
        return 0.5 * thetad**2 - G * jnp.cos(theta)

    @jax.jit
    def run(q, qd):
        def substep(carry, _):
            q, qd = carry
            qdd = qdd_of(model, q, qd, fixed_base=True)
            qd = qd + dt * qdd
            q = q.at[7:].add(dt * qd[6:])
            return (q, qd), None
        return jax.lax.scan(substep, (q, qd), None, length=240)[0]

    q, qd = run(q0, jnp.zeros(model.ndof))
    e0 = pend_energy(1.2, 0.0)
    e1 = pend_energy(q[7], qd[6])
    swing_range = G * (1 - float(jnp.cos(1.2)))  # available energy scale
    assert abs(float(e1 - e0)) < 0.01 * swing_range, (e0, e1)


def test_mass_matrix_symmetric_posdef():
    model = walker3d()
    q = jnp.concatenate(
        [jnp.array([0.0, 0.0, 1.0]), qt.from_euler_zyx(jnp.array(0.3), jnp.array(0.1), jnp.array(-0.2)),
         jnp.asarray(model.init_q_joints) + 0.1]
    )
    kin = km.forward_kinematics(model, q)
    phi = dyn.dof_axes(model, kin)
    M = dyn.mass_matrix(model, kin, phi)
    assert np.allclose(M, M.T, atol=1e-3)
    w = np.linalg.eigvalsh(np.asarray(M, dtype=np.float64))
    assert w.min() > 0, w.min()
    # total mass appears in the linear-linear block
    assert np.allclose(np.diag(M)[3:6], model.total_mass, rtol=1e-4)


def test_walker_settles_on_ground():
    """Dropped 5 cm above flat ground, the walker's feet stop penetrating
    and total contact force balances weight (single-contact statics)."""
    model = walker3d()
    state = engine.default_state(model)
    state = state._replace(q=state.q.at[2].add(0.05))

    @jax.jit
    def run(state):
        def body(st, _):
            return engine.step(
                model, st, jnp.zeros(model.njoints), NO_STONES,
                0.1, jnp.array(True),
            )
        def scan_body(st, _):
            st, info = body(st, None)
            return st, info
        return jax.lax.scan(scan_body, state, None, length=120)

    state, infos = run(state)  # 2 s
    # it will likely have fallen over (no controller), but must NOT sink
    # through the floor or blow up
    assert np.isfinite(np.asarray(state.q)).all()
    assert state.q[2] > 0.03, state.q[2]  # pelvis sphere rests on the floor
    assert np.abs(np.asarray(state.qd)).max() < 50.0
    # in the final 20 control steps there is sustained contact
    assert np.asarray(infos.foot_contact[-20:]).any()


def test_vmap_batch_consistency():
    """vmap-ed engine step == loop over single steps."""
    model = walker3d()
    base = engine.default_state(model)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    qs = jnp.stack([base.q + 0.01 * jax.random.normal(k, base.q.shape) for k in keys])
    qds = jnp.stack([0.1 * jax.random.normal(k, base.qd.shape) for k in keys])
    # renormalize quaternions
    qs = qs.at[:, 3:7].set(qs[:, 3:7] / jnp.linalg.norm(qs[:, 3:7], axis=1, keepdims=True))
    taus = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (3, model.njoints))

    def one(q, qd, tau):
        st, info = engine.step(
            model, engine.PhysicsState(q, qd), tau, NO_STONES, 0.1, jnp.array(True)
        )
        return st.q, st.qd

    batched = jax.vmap(one)(qs, qds, taus)
    for i in range(3):
        qi, qdi = one(qs[i], qds[i], taus[i])
        assert np.allclose(batched[0][i], qi, atol=1e-4)
        assert np.allclose(batched[1][i], qdi, atol=1e-4)
