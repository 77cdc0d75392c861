"""Articulated forward dynamics: CRBA mass matrix + RNEA bias forces.

TPU-native replacement for PyBullet's forward dynamics (SURVEY.md §2.10).
Formulated entirely in a world-aligned frame re-centered at the robot root,
so no inter-body coordinate transforms are needed: each DoF k contributes a
6D motion axis Phi_k, the mass matrix is the dense ancestor-masked product
M = Phi I^C Phi^T, and bias forces come from a two-pass RNEA with qdd = 0.
Body loops are static unrolls; everything else is batched linear algebra
that `vmap`s cleanly over thousands of envs.

Single-robot functions; batching via vmap outside.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from steppingstone_tpu.core import spatial as sp
from steppingstone_tpu.ops.linalg import cholesky_solve
from steppingstone_tpu.physics.kinematics import Kin
from steppingstone_tpu.physics.model import RobotModel

GRAVITY = 9.8


@lru_cache(maxsize=None)
def _ancestor_mask(model: RobotModel) -> np.ndarray:
    """(ndof, ndof) float mask: A[k, l] = 1 iff dof l is an ancestor-or-self
    of dof k (root dofs use lower-triangular ordering among themselves)."""
    nd = model.ndof
    A = np.zeros((nd, nd), dtype=np.float32)
    # root block: lower triangle incl. diagonal
    A[:6, :6] = np.tril(np.ones((6, 6)))
    # joint dofs: dof index of body i (>0) is 5 + i
    for i in range(1, model.nbodies):
        k = 5 + i
        A[k, 0:6] = 1.0
        for b in model.ancestors(i):
            if b > 0:
                A[k, 5 + b] = 1.0
    return A


def dof_axes(model: RobotModel, kin: Kin) -> jnp.ndarray:
    """Motion axes Phi: (ndof, 6) in root-centered world Plücker coords."""
    dtype = kin.pos.dtype
    root = kin.pos[0]
    eye = jnp.eye(6, dtype=dtype)
    a = kin.axis[1:]                       # (NJ, 3)
    p_rel = kin.pos[1:] - root             # (NJ, 3)
    joint_rows = jnp.concatenate([a, jnp.cross(p_rel, a)], axis=-1)
    return jnp.concatenate([eye, joint_rows], axis=0)


def mass_matrix(model: RobotModel, kin: Kin, phi: jnp.ndarray) -> jnp.ndarray:
    """Joint-space inertia matrix via world-frame CRBA. (ndof, ndof)."""
    dtype = kin.pos.dtype
    root = kin.pos[0]
    mass = jnp.asarray(model.mass, dtype=dtype)
    # composite inertia accumulation (leaves -> root), 6x6 per body
    I_comp = [
        sp.inertia_matrix(mass[i], kin.com[i] - root, kin.inertia_w[i])
        for i in range(model.nbodies)
    ]
    for i in range(model.nbodies - 1, 0, -1):
        p = int(model.parent[i])
        I_comp[p] = I_comp[p] + I_comp[i]

    # per-dof composite inertia: root dofs use body 0, joint dof of body i uses i
    Ic = jnp.stack([I_comp[0]] * 6 + [I_comp[i] for i in range(1, model.nbodies)])
    F = jnp.einsum("kab,kb->ka", Ic, phi, precision="highest")          # (ndof, 6)
    L = jnp.matmul(F, phi.T, precision="highest") * jnp.asarray(
        _ancestor_mask(model), dtype=dtype
    )
    return L + L.T - jnp.diagflat(jnp.diagonal(L))


def bias_forces(
    model: RobotModel,
    kin: Kin,
    vel: jnp.ndarray,
    phi: jnp.ndarray,
    f_ext: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """RNEA with qdd=0: generalized bias forces C(q, qd) - tau_ext, (ndof,).

    vel: (NB, 6) body spatial velocities; f_ext: (NB, 6) external spatial
    forces (root-centered Plücker) acting on each body, or None.
    """
    dtype = kin.pos.dtype
    root = kin.pos[0]
    mass = jnp.asarray(model.mass, dtype=dtype)

    # forward pass: velocity-product accelerations
    # (gravity trick: pretend the base accelerates upward at +g)
    g = jnp.array([0, 0, 0, 0, 0, GRAVITY], dtype=dtype)
    acc = [g]
    for i in range(1, model.nbodies):
        p = int(model.parent[i])
        joint_vel = vel[i] - vel[p]  # = Phi_i * qdot_i
        acc.append(acc[p] + sp.cross_motion(vel[i], joint_vel))

    # backward pass: net body forces, accumulated toward the root
    f = []
    for i in range(model.nbodies):
        com_rel = kin.com[i] - root
        Iv = sp.inertia_mul(mass[i], com_rel, kin.inertia_w[i], vel[i])
        fi = sp.inertia_mul(mass[i], com_rel, kin.inertia_w[i], acc[i])
        fi = fi + sp.cross_force(vel[i], Iv)
        if f_ext is not None:
            fi = fi - f_ext[i]
        f.append(fi)
    for i in range(model.nbodies - 1, 0, -1):
        p = int(model.parent[i])
        f[p] = f[p] + f[i]

    C_root = f[0]
    C_joints = jnp.stack([jnp.dot(phi[5 + i], f[i]) for i in range(1, model.nbodies)])
    return jnp.concatenate([C_root, C_joints])


def forward_dynamics(
    model: RobotModel,
    kin: Kin,
    vel: jnp.ndarray,
    tau: jnp.ndarray,
    f_ext: jnp.ndarray | None = None,
    reg: float = 1e-5,
    fixed_base: bool = False,
    damping_diag: jnp.ndarray | None = None,
    stiffness_diag: jnp.ndarray | None = None,
    dt: float = 0.0,
) -> jnp.ndarray:
    """Solve M qdd = tau - C for qdd via Cholesky. tau: (ndof,).

    damping_diag/stiffness_diag (ndof,) implement *implicit* joint
    spring-dampers (MuJoCo implicitfast-style): their explicit forces are
    already inside `tau`, and `dt*D + dt^2*K` is added to the LHS so stiff
    per-joint dampers/springs stay stable at the 240 Hz substep rate even
    on very light intermediate links.

    fixed_base=True pins the root (qdd_root = 0) by solving only the joint
    block — used for analytic tests and fixtures-on-stands.
    """
    phi = dof_axes(model, kin)
    M = mass_matrix(model, kin, phi)
    C = bias_forces(model, kin, vel, phi, f_ext)
    rhs = tau - C
    lhs_diag = reg * jnp.ones(model.ndof, dtype=M.dtype)
    if damping_diag is not None:
        lhs_diag = lhs_diag + dt * damping_diag
    if stiffness_diag is not None:
        lhs_diag = lhs_diag + (dt * dt) * stiffness_diag
    M = M + jnp.diagflat(lhs_diag)
    # unrolled batched solve: ~20x faster than XLA's batched
    # cholesky+triangular_solve at (4096, 27, 27) on TPU (ops/linalg.py)
    if fixed_base:
        qdd_j = cholesky_solve(M[6:, 6:], rhs[6:])
        return jnp.concatenate([jnp.zeros(6, dtype=M.dtype), qdd_j])
    return cholesky_solve(M, rhs)
