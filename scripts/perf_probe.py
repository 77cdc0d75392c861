"""Component-level physics timing probe (run on the target backend).

Times the full engine step and ablations (no-solve, FK-only, contact-only)
at the bench batch size to locate the bottleneck before optimizing.

  python scripts/perf_probe.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from steppingstone_tpu.core import quaternion as qt
from steppingstone_tpu.physics import contact as ct
from steppingstone_tpu.physics import dynamics as dyn
from steppingstone_tpu.physics import engine
from steppingstone_tpu.physics import kinematics as km
from steppingstone_tpu.physics.robots.walker3d import walker3d

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N_ITER = 50
model = walker3d()
STONES = jnp.zeros((24, 6))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name:34s} {dt*1e3:8.3f} ms  ({B/dt/1e6:7.2f} M/s)")
    return dt


def batch_state(key):
    st = engine.default_state(model)
    qs = jnp.tile(st.q, (B, 1)) + 0.01 * jax.random.normal(key, (B, model.nq))
    qs = qs.at[:, 3:7].set(qs[:, 3:7] / jnp.linalg.norm(qs[:, 3:7], axis=1, keepdims=True))
    qds = 0.1 * jax.random.normal(key, (B, model.ndof))
    return qs, qds


def main():
    print(f"backend={jax.default_backend()} B={B} model={model.name} "
          f"ndof={model.ndof} nbodies={model.nbodies}")
    key = jax.random.PRNGKey(0)
    qs, qds = batch_state(key)
    taus = 0.2 * jax.random.normal(key, (B, model.njoints))

    # ---- full control step (4 substeps) ------------------------------
    @jax.jit
    def full_step(qs, qds, taus):
        def one(q, qd, tau):
            st, info = engine.step(
                model, engine.PhysicsState(q, qd), tau, STONES, 0.25,
                jnp.asarray(False),
            )
            return st.q, st.qd
        return jax.vmap(one)(qs, qds, taus)

    t_full = timeit("full control step (4 substeps)", full_step, qs, qds, taus)

    # ---- single substep ----------------------------------------------
    @jax.jit
    def one_substep(qs, qds, taus):
        def one(q, qd, tau):
            st, info = engine._substep(
                model, engine.PhysicsState(q, qd), tau, STONES, 0.25,
                jnp.asarray(False), ct.ContactParams(),
            )
            return st.q, st.qd
        return jax.vmap(one)(qs, qds, taus)

    timeit("single substep", one_substep, qs, qds, taus)

    # ---- FK + velocities ---------------------------------------------
    @jax.jit
    def fk_only(qs, qds):
        def one(q, qd):
            kin = km.forward_kinematics(model, q)
            vel = km.body_velocities(model, kin, qd)
            return kin.pos, vel
        return jax.vmap(one)(qs, qds)

    timeit("FK + velocities", fk_only, qs, qds)

    # ---- contact ------------------------------------------------------
    @jax.jit
    def contact_only(qs, qds):
        def one(q, qd):
            kin = km.forward_kinematics(model, q)
            vel = km.body_velocities(model, kin, qd)
            pts = km.contact_points(model, kin)
            pvel = km.contact_point_velocities(model, kin, vel, pts)
            cout = ct.compute_contacts(
                pts, pvel, jnp.asarray(model.contact_radius), STONES, 0.25,
                jnp.asarray(False),
            )
            return cout.force
        return jax.vmap(one)(qs, qds)

    timeit("FK + contact", contact_only, qs, qds)

    # ---- mass matrix + bias (no solve) --------------------------------
    @jax.jit
    def crba_rnea(qs, qds):
        def one(q, qd):
            kin = km.forward_kinematics(model, q)
            vel = km.body_velocities(model, kin, qd)
            phi = dyn.dof_axes(model, kin)
            M = dyn.mass_matrix(model, kin, phi)
            C = dyn.bias_forces(model, kin, vel, phi, None)
            return M, C
        return jax.vmap(one)(qs, qds)

    timeit("FK + CRBA + RNEA (no solve)", crba_rnea, qs, qds)

    # ---- solve only (fixed M) -----------------------------------------
    M, C = crba_rnea(qs, qds)
    M = M + 1e-5 * jnp.eye(model.ndof)

    @jax.jit
    def solve_only(M, C):
        L = jnp.linalg.cholesky(M)
        from jax.scipy.linalg import solve_triangular
        y = solve_triangular(L, C[..., None], lower=True)
        return solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False
        )

    timeit("cholesky + 2 tri solves", solve_only, M, C)

    @jax.jit
    def inv_only(M):
        return jnp.linalg.inv(M)

    timeit("matrix inverse (LU)", inv_only, M)

    @jax.jit
    def matvec(Minv, C):
        return jnp.einsum("bij,bj->bi", Minv, C)

    Minv = inv_only(M)
    timeit("precomputed-inverse matvec", matvec, Minv, C)

    # ---- policy MLP for scale ----------------------------------------
    from steppingstone_tpu.agents.networks import ActorCritic
    net = ActorCritic(action_dim=model.action_dim, num_ensembles=1)
    params = net.init(key, jnp.zeros((1, 60)))
    obs = jax.random.normal(key, (B, 60))

    @jax.jit
    def mlp(params, obs):
        return net.apply(params, obs, method="action_mean")

    timeit("policy MLP forward", mlp, params, obs)


if __name__ == "__main__":
    main()

# appended: unrolled-solve comparison
def extra():
    from steppingstone_tpu.ops.linalg import cholesky_solve
    key = jax.random.PRNGKey(0)
    qs, qds = batch_state(key)

    @jax.jit
    def crba(qs, qds):
        def one(q, qd):
            kin = km.forward_kinematics(model, q)
            vel = km.body_velocities(model, kin, qd)
            phi = dyn.dof_axes(model, kin)
            return dyn.mass_matrix(model, kin, phi), dyn.bias_forces(model, kin, vel, phi, None)
        return jax.vmap(one)(qs, qds)

    M, C = crba(qs, qds)
    M = M + 1e-4 * jnp.eye(model.ndof)
    timeit("unrolled cholesky_solve", jax.jit(cholesky_solve), M, C)
