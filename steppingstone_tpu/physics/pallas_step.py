"""Pallas TPU kernel: the full physics control step, fused in VMEM.

The jnp engine (`physics/engine.py`) is ~90 HBM round-trips of
(B, NB, 6, 6)-shaped intermediates per substep — memory-bound at large
batch. This kernel runs the *entire* control step (FK, contacts, CRBA,
RNEA, implicit-diagonal Cholesky solve, integration, x `substeps`) with
every intermediate resident in VMEM; HBM traffic is just q/qd/tau/stones
in and q'/qd'/diagnostics out.

Layout: 1024 envs per grid step; every per-env scalar is one (8, 128)
f32 block (envs on sublanes x lanes, full VPU width). Structure axes
(bodies, dofs, contacts, stones) are static Python unrolls.

Values in the kernel are "symbolic scalars": `None` (exact zero), a
Python float (compile-time constant — model geometry, joint axes), or an
(8, 128) block. The helper ops below partially evaluate, so canonical
joint axes (0/±1 entries), zero anchors, etc. prune large parts of the
spatial algebra at trace time — the same role constant folding plays in
hand-written Featherstone kernels.

Numerics match `engine._substep` (same formulas, same order of
operations where it matters); parity is tested in
tests/test_pallas_step.py against the vmapped jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
TS, TL = 8, 128  # (sublane, lane) of one block


# ---------------------------------------------------------------------------
# symbolic scalar ops: value = None (zero) | float (const) | (8,128) block
# ---------------------------------------------------------------------------

def smul(a, b):
    if a is None or b is None:
        return None
    if isinstance(a, float) and a == 0.0:
        return None
    if isinstance(b, float) and b == 0.0:
        return None
    if isinstance(a, float) and isinstance(b, float):
        return a * b
    if isinstance(a, float):
        return b if a == 1.0 else (-b if a == -1.0 else a * b)
    if isinstance(b, float):
        return a if b == 1.0 else (-a if b == -1.0 else a * b)
    return a * b


def sadd(a, b):
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, float) and isinstance(b, float):
        return a + b
    return a + b


def ssub(a, b):
    return sadd(a, sneg(b))


def sneg(a):
    if a is None:
        return None
    return -a


def sdot(xs, ys):
    out = None
    for x, y in zip(xs, ys):
        out = sadd(out, smul(x, y))
    return out


def cross3(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (
        ssub(smul(ay, bz), smul(az, by)),
        ssub(smul(az, bx), smul(ax, bz)),
        ssub(smul(ax, by), smul(ay, bx)),
    )


def add3(a, b):
    return tuple(sadd(x, y) for x, y in zip(a, b))


def sub3(a, b):
    return tuple(ssub(x, y) for x, y in zip(a, b))


def scale3(a, s):
    return tuple(smul(x, s) for x in a)


def _blk(x):
    """Materialize a symbolic scalar as an (8, 128) block."""
    if x is None:
        return jnp.zeros((TS, TL), jnp.float32)
    if isinstance(x, float):
        return jnp.full((TS, TL), x, jnp.float32)
    return x


def swhere(m, a, b):
    if a is None and b is None:
        return None
    a = 0.0 if a is None else a
    b = 0.0 if b is None else b
    return jnp.where(m, a, b)


# quaternion helpers on (w, x, y, z) tuples of symbolic scalars ------------

def qmul(a, b):
    """Hamilton product (quaternion.py:25-37)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        ssub(ssub(ssub(smul(aw, bw), smul(ax, bx)), smul(ay, by)), smul(az, bz)),
        ssub(sadd(sadd(smul(aw, bx), smul(ax, bw)), smul(ay, bz)), smul(az, by)),
        sadd(sadd(ssub(smul(aw, by), smul(ax, bz)), smul(ay, bw)), smul(az, bx)),
        sadd(ssub(sadd(smul(aw, bz), smul(ax, by)), smul(ay, bx)), smul(az, bw)),
    )


def qrot(q, v):
    """rotate(q, v) = v + 2 (w uv + u x uv), uv = u x v (quaternion.py:45)."""
    w = q[0]
    u = q[1:4]
    uv = cross3(u, v)
    t = add3(scale3(uv, smul(2.0, w)), scale3(cross3(u, uv), 2.0))
    return add3(v, t)


def q_to_R(q):
    """3x3 rotation entries R[r][c] (quaternion.py:72)."""
    w, x, y, z = q
    xx, yy, zz = smul(x, x), smul(y, y), smul(z, z)
    xy, xz, yz = smul(x, y), smul(x, z), smul(y, z)
    wx, wy, wz = smul(w, x), smul(w, y), smul(w, z)
    return [
        [ssub(1.0, smul(2.0, sadd(yy, zz))), smul(2.0, ssub(xy, wz)), smul(2.0, sadd(xz, wy))],
        [smul(2.0, sadd(xy, wz)), ssub(1.0, smul(2.0, sadd(xx, zz))), smul(2.0, ssub(yz, wx))],
        [smul(2.0, ssub(xz, wy)), smul(2.0, sadd(yz, wx)), ssub(1.0, smul(2.0, sadd(xx, yy)))],
    ]


def q_axis_angle(axis_const, angle):
    """axis: 3 python floats (unit); angle: block."""
    half = smul(0.5, angle)
    c, s = jnp.cos(half), jnp.sin(half)
    return (c, smul(axis_const[0], s), smul(axis_const[1], s), smul(axis_const[2], s))


# spatial helpers on ([w3], [v3]) motion / ([n3], [f3]) force tuples -------

def cross_motion(v, m):
    wv, vv = v
    wm, vm = m
    return (cross3(wv, wm), add3(cross3(wv, vm), cross3(vv, wm)))


def cross_force(v, f):
    wv, vv = v
    nf, ff = f
    return (add3(cross3(wv, nf), cross3(vv, ff)), cross3(wv, ff))


def add6(a, b):
    return (add3(a[0], b[0]), add3(a[1], b[1]))


def sub6(a, b):
    return (sub3(a[0], b[0]), sub3(a[1], b[1]))


def dot6(a, b):
    return sadd(sdot(a[0], b[0]), sdot(a[1], b[1]))


def sym3_mul(S, v):
    """S: dict with keys (a,b) a<=b of symmetric 3x3; v: vec3."""
    def e(a, b):
        return S[(a, b)] if a <= b else S[(b, a)]
    return tuple(
        sadd(sadd(smul(e(r, 0), v[0]), smul(e(r, 1), v[1])), smul(e(r, 2), v[2]))
        for r in range(3)
    )


def inertia_mul(m_const, c, iw, v):
    """I(origin) @ [w; v_O] for a body: mass m (const), CoM offset c (vec3),
    rotational inertia-about-CoM iw (sym3 dict). (spatial.py:72-82)."""
    w, vo = v
    vc = add3(vo, cross3(w, c))
    h_lin = scale3(vc, m_const)
    h_ang = add3(sym3_mul(iw, w), cross3(c, h_lin))
    return (h_ang, h_lin)


def spatial_inertia(m_const, c, iw):
    """Compact spatial inertia about the origin: (ang sym3 dict, h vec3,
    m const) with ang = I_c - m (c c^T - |c|^2 1), h = m c.

    Closed under addition, so composite (CRBA) accumulation stays compact.
    """
    c2 = sadd(sadd(smul(c[0], c[0]), smul(c[1], c[1])), smul(c[2], c[2]))
    ang = {}
    for a in range(3):
        for b in range(a, 3):
            v = ssub(iw[(a, b)], smul(m_const, smul(c[a], c[b])))
            if a == b:
                v = sadd(v, smul(m_const, c2))
            ang[(a, b)] = v
    return (ang, scale3(c, m_const), m_const)


def si_add(A, B):
    angA, hA, mA = A
    angB, hB, mB = B
    return (
        {k: sadd(angA[k], angB[k]) for k in angA},
        add3(hA, hB),
        mA + mB,
    )


def si_mul(I6, phi):
    """(ang, h, m) @ [w; v]: ang w + h x v ; -h x w + m v."""
    ang, h, m = I6
    w, v = phi
    top = add3(sym3_mul(ang, w), cross3(h, v))
    bot = add3(sneg3(cross3(h, w)), scale3(v, m))
    return (top, bot)


def sneg3(a):
    return tuple(sneg(x) for x in a)


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------

def build_batched_step(
    model,
    cparams,
    substeps: int,
    n_stones: int,
    sim_dt: float,
    limit_k: float,
    limit_c: float,
    max_qd: float,
    gravity: float,
    interpret: bool = False,
    pd: bool = False,
    support_hy=None,
):
    """Returns `f(q, qd, tau_j, stones, stone_radius, use_ground)` over a
    leading batch axis B (multiple of 1024) implementing
    `engine.step` x B as one pallas_call.

    pd=True: stable-PD mode (engine._substep pd branch) — signature gains
    (target, power) after tau_j; PD torque is re-evaluated every substep
    from the in-VMEM state with kp/kd folded into the implicit diagonals.

    support_hy=None: disc support (lateral bound |lat| <= stone_radius);
    support_hy=<float>: plank support — box bound in the stone's in-plane
    (heading, lateral) frame with half-extents (stone_radius, support_hy),
    mirroring contact.compute_contacts(support_hy=...)."""
    NB, NJ, NC = model.nbodies, model.njoints, model.ncontacts
    nq, nd = model.nq, model.ndof
    parent = [int(p) for p in model.parent]
    jaxis = [tuple(float(a) for a in row) for row in model.joint_axis]
    anchor = [tuple(float(a) for a in row) for row in model.joint_anchor]
    # fixed parent->joint frame rotations (URDF <origin rpy>): wxyz consts,
    # snapped so identity/axis-aligned entries prune via the symbolic
    # algebra; None = identity for the whole model (built-in robots)
    if model.joint_rot is not None:
        def _snap(x):
            x = float(x)
            for v in (0.0, 1.0, -1.0):
                if abs(x - v) < 1e-12:
                    return v
            return x
        jrot = [tuple(_snap(a) for a in row) for row in model.joint_rot]
        jrot = [
            None if r == (1.0, 0.0, 0.0, 0.0) else r for r in jrot
        ]
    else:
        jrot = [None] * NB
    com_l = [tuple(float(a) for a in row) for row in model.com]
    mass = [float(m) for m in model.mass]
    inert = [tuple(float(a) for a in row) for row in model.inertia]
    j_lo = [float(x) for x in model.joint_lower]
    j_hi = [float(x) for x in model.joint_upper]
    j_damp = [float(x) for x in model.joint_damping]
    j_stiff = [float(x) for x in model.joint_stiffness]
    j_ref = [float(x) for x in model.joint_spring_ref]
    kp_l = [float(x) if a else 0.0 for x, a in zip(model.kp, model.actuated)]
    kd_l = [float(x) if a else 0.0 for x, a in zip(model.kd, model.actuated)]
    tlim_l = [
        float(x) if a else 0.0
        for x, a in zip(model.torque_limit, model.actuated)
    ]
    cbody = [int(b) for b in model.contact_body]
    coff = [tuple(float(a) for a in row) for row in model.contact_offset]
    crad = [float(r) for r in model.contact_radius]
    cfoot = [int(f) for f in model.foot_of_contact]
    ancestors = [list(model.ancestors(i)) for i in range(NB)]

    kn, cn, mu, kt, margin = (
        float(cparams.kn), float(cparams.cn), float(cparams.mu),
        float(cparams.kt), float(cparams.margin),
    )
    REG = 1e-5
    N_INFO = NJ + 7  # fc(2) fs(2) ff(2) at_limit(NJ) fsum(1)

    # dof k -> (ancestor-or-self dof list) for the sparse M pattern
    dof_anc = [list(range(k + 1)) for k in range(6)]
    for i in range(1, NB):
        lst = list(range(6)) + [5 + b for b in ancestors[i] if b > 0] + [5 + i]
        dof_anc.append(sorted(lst))

    def substep(q, qd, tau_in, st_c, st_n, sr, ug, pd_args=None, st_u=None):
        """q: list nq, qd: list nd, tau_in: list NJ of symbolic scalars.
        st_c: list of S centers (vec3), st_n: list of S normals (vec3),
        sr: stone radius block, ug: use_ground block (0/1).
        pd_args: None | (target list NJ, power block) — stable PD."""
        root = (q[0], q[1], q[2])
        quat0 = (q[3], q[4], q[5], q[6])
        qj = q[7:]
        omega0, v0, qdj = (qd[0], qd[1], qd[2]), (qd[3], qd[4], qd[5]), qd[6:]

        # ---- FK (kinematics.py:39-70) --------------------------------
        pos = [root]
        quat = [quat0]
        axis_w = [(None, None, None)]
        for i in range(1, NB):
            p = parent[i]
            p_i = add3(pos[p], qrot(quat[p], anchor[i]))
            # fixed frame rotation before the hinge (kinematics.py:49-54)
            q_p = quat[p] if jrot[i] is None else qmul(quat[p], jrot[i])
            q_i = qmul(q_p, q_axis_angle(jaxis[i], qj[i - 1]))
            pos.append(p_i)
            quat.append(q_i)
            axis_w.append(qrot(q_i, jaxis[i]))
        R = [q_to_R(qt) for qt in quat]
        com_w = [
            add3(pos[i], tuple(sdot(R[i][r], com_l[i]) for r in range(3)))
            for i in range(NB)
        ]
        # inertia_w[a][b] = sum_k R[a][k] I_k R[b][k] (sym3 dict)
        iw = []
        for i in range(NB):
            d = {}
            for a in range(3):
                for b in range(a, 3):
                    d[(a, b)] = sdot(
                        [smul(R[i][a][k], inert[i][k]) for k in range(3)],
                        R[i][b],
                    )
            iw.append(d)

        # ---- body velocities (kinematics.py:73-88) ---------------------
        phi_j = [None]  # per body: motion subspace ([a],[p_rel x a])
        for i in range(1, NB):
            p_rel = sub3(pos[i], root)
            phi_j.append((axis_w[i], cross3(p_rel, axis_w[i])))
        vel = [(omega0, v0)]
        for i in range(1, NB):
            w, v = phi_j[i]
            vel.append(
                (
                    add3(vel[parent[i]][0], scale3(w, qdj[i - 1])),
                    add3(vel[parent[i]][1], scale3(v, qdj[i - 1])),
                )
            )

        # ---- contacts (contact.py:54-109) ------------------------------
        f_ext = [None] * NB  # spatial force per body or None
        fn_c, si_c = [], []
        fsum = None
        for c in range(NC):
            b = cbody[c]
            pt = add3(pos[b], tuple(sdot(R[b][r], coff[c]) for r in range(3)))
            pvel = add3(vel[b][1], cross3(vel[b][0], sub3(pt, root)))
            rad = crad[c]
            # ground plane candidate (index -1)
            g_pen = ssub(rad, pt[2])
            g_ok = (ug > 0.0) & (_blk(g_pen) > 0.0)
            best_pen = swhere(g_ok, g_pen, -3.4e38)
            best_n = (
                swhere(g_ok, None, None),
                swhere(g_ok, None, None),
                swhere(g_ok, 1.0, 1.0),
            )
            best_i = -1.0
            for s in range(n_stones):
                rel = sub3(pt, st_c[s])
                n_s = st_n[s]
                dist_n = sdot(rel, n_s)
                lat = sub3(rel, scale3(n_s, dist_n))
                pen = ssub(rad, dist_n)
                rim = sadd(sr, margin)
                if support_hy is None:
                    lat2 = sdot(lat, lat)
                    lat_ok = _blk(lat2) <= _blk(smul(rim, rim))
                else:
                    # plank: box bound in the stone's in-plane frame
                    # (contact.support_axes)
                    ux_s, uy_s = st_u[s]
                    x_l = sdot(lat, ux_s)
                    y_l = sdot(lat, uy_s)
                    lat_ok = (jnp.abs(_blk(x_l)) <= _blk(rim)) & (
                        jnp.abs(_blk(y_l)) <= support_hy + margin
                    )
                valid = (
                    lat_ok
                    & (_blk(pen) > 0.0)
                    & (_blk(dist_n) > -rad)
                )
                pen_eff = swhere(valid, pen, -3.4e38)
                better = pen_eff > _blk(best_pen)
                best_pen = swhere(better, pen_eff, best_pen)
                best_n = tuple(
                    swhere(better, n_s[a], best_n[a]) for a in range(3)
                )
                best_i = swhere(better, float(s), best_i)
            in_c = _blk(best_pen) > 0.0
            pen_c = jnp.maximum(_blk(best_pen), 0.0)
            vn = sdot(pvel, best_n)
            fn = ssub(smul(kn, pen_c), smul(smul(cn, vn), swhere(pen_c > 0.0, 1.0, 0.0)))
            fn = jnp.maximum(_blk(fn), 0.0) * in_c
            vt = sub3(pvel, scale3(best_n, vn))
            vt_norm = jnp.sqrt(_blk(sadd(sdot(vt, vt), 1e-8)))
            ft_mag = jnp.minimum(mu * fn, kt * vt_norm)
            scale = -ft_mag / vt_norm
            force = add3(scale3(best_n, fn), scale3(vt, scale))
            fsp = (cross3(sub3(pt, root), force), force)  # spatial force
            f_ext[b] = fsp if f_ext[b] is None else add6(f_ext[b], fsp)
            fn_c.append(fn)
            si_c.append(swhere(in_c & (_blk(best_i) >= 0.0), best_i, -1.0))
            fsum = sadd(fsum, fn)

        # ---- joint torques (engine.py:43-65,99-108) --------------------
        tau = []
        at_limit = []
        damp_eff, stiff_eff = [], []
        for j in range(NJ):
            below = jnp.minimum(_blk(ssub(qj[j], j_lo[j])), 0.0)
            above = jnp.maximum(_blk(ssub(qj[j], j_hi[j])), 0.0)
            out = (below < 0.0) | (above > 0.0)
            outf = swhere(out, 1.0, 0.0)
            tau_lim = ssub(smul(-limit_k, sadd(below, above)), smul(limit_c, smul(qdj[j], outf)))
            passive = ssub(smul(-j_damp[j], qdj[j]), smul(j_stiff[j], ssub(qj[j], j_ref[j])))
            tau_act = tau_in[j]
            damp_j = sadd(j_damp[j], smul(limit_c, outf))
            stiff_j = sadd(j_stiff[j], smul(limit_k, outf))
            if pd_args is not None and (kp_l[j] > 0.0 or kd_l[j] > 0.0):
                # gate matches engine._substep exactly: PD applies to every
                # actuated joint (kp OR kd nonzero), so a kd-only joint gets
                # the same damping torque on both paths
                # stable PD (engine._substep pd branch): explicit torque
                # from the current substep state, kp/kd implicit
                target, power = pd_args
                tau_pd = jnp.clip(
                    _blk(ssub(smul(kp_l[j], ssub(target[j], qj[j])),
                              smul(kd_l[j], qdj[j]))),
                    -tlim_l[j], tlim_l[j],
                )
                tau_act = sadd(tau_act, smul(power, tau_pd))
                damp_j = sadd(damp_j, smul(power, kd_l[j]))
                stiff_j = sadd(stiff_j, smul(power, kp_l[j]))
            tau.append(sadd(sadd(tau_act, passive), tau_lim))
            at_limit.append(outf)
            damp_eff.append(damp_j)
            stiff_eff.append(stiff_j)

        # ---- CRBA composite inertias (dynamics.py:58-76) ---------------
        Ic = [spatial_inertia(mass[i], sub3(com_w[i], root), iw[i]) for i in range(NB)]
        for i in range(NB - 1, 0, -1):
            Ic[parent[i]] = si_add(Ic[parent[i]], Ic[i])

        # phi per dof (root: unit axes; joints: ([a],[p x a]))
        phi = []
        for k in range(6):
            w = tuple(1.0 if a == k else None for a in range(3))
            v = tuple(1.0 if a == k - 3 else None for a in range(3))
            phi.append((w, v))
        for i in range(1, NB):
            phi.append(phi_j[i])
        dof_body = [0] * 6 + list(range(1, NB))

        F = [si_mul(Ic[dof_body[k]], phi[k]) for k in range(nd)]
        M = [dict() for _ in range(nd)]  # lower triangle M[k][l], l <= k
        for k in range(nd):
            for l in dof_anc[k]:
                M[k][l] = dot6(F[k], phi[l])

        # ---- RNEA bias (dynamics.py:79-120) -----------------------------
        g6 = ((None, None, None), (None, None, gravity))
        acc = [g6]
        for i in range(1, NB):
            jv = sub6(vel[i], vel[parent[i]])
            acc.append(add6(acc[parent[i]], cross_motion(vel[i], jv)))
        f = []
        for i in range(NB):
            c_rel = sub3(com_w[i], root)
            Iv = inertia_mul(mass[i], c_rel, iw[i], vel[i])
            fi = add6(inertia_mul(mass[i], c_rel, iw[i], acc[i]), cross_force(vel[i], Iv))
            if f_ext[i] is not None:
                fi = sub6(fi, f_ext[i])
            f.append(fi)
        for i in range(NB - 1, 0, -1):
            f[parent[i]] = add6(f[parent[i]], f[i])
        C = [f[0][0][0], f[0][0][1], f[0][0][2], f[0][1][0], f[0][1][1], f[0][1][2]]
        for i in range(1, NB):
            C.append(dot6(phi[5 + i], f[i]))

        # rhs = tau_full - C ; LHS diag += reg + dt*D + dt^2*K
        rhs = [sneg(C[k]) for k in range(6)]
        for j in range(NJ):
            rhs.append(ssub(tau[j], C[6 + j]))
        for k in range(6):
            M[k][k] = sadd(M[k][k], REG)
        for j in range(NJ):
            k = 6 + j
            M[k][k] = sadd(
                M[k][k],
                sadd(REG, sadd(smul(sim_dt, damp_eff[j]), smul(sim_dt * sim_dt, stiff_eff[j]))),
            )

        # ---- dense symbolic Cholesky solve (ops/linalg.py semantics) ----
        L = [dict() for _ in range(nd)]
        Ld_inv = [None] * nd
        for j in range(nd):
            s = M[j].get(j)
            for k in L[j]:
                s = ssub(s, smul(L[j][k], L[j][k]))
            d_inv = jax.lax.rsqrt(jnp.maximum(_blk(s), 1e-12))
            Ld_inv[j] = d_inv
            for i in range(j + 1, nd):
                v = M[i].get(j)
                for k in L[i]:
                    if k in L[j]:
                        v = ssub(v, smul(L[i][k], L[j][k]))
                if v is not None:
                    L[i][j] = smul(v, d_inv)
        y = [None] * nd
        for i in range(nd):
            s = rhs[i]
            for k, lik in L[i].items():
                s = ssub(s, smul(lik, y[k]))
            y[i] = smul(s, Ld_inv[i])
        qdd = [None] * nd
        for i in reversed(range(nd)):
            s = y[i]
            for k in range(i + 1, nd):
                if i in L[k]:
                    s = ssub(s, smul(L[k][i], qdd[k]))
            qdd[i] = smul(s, Ld_inv[i])

        # ---- semi-implicit Euler (engine.py:117-126) --------------------
        qd_new = [
            jnp.clip(_blk(sadd(qd[k], smul(sim_dt, qdd[k]))), -max_qd, max_qd)
            for k in range(nd)
        ]
        omega = (qd_new[0], qd_new[1], qd_new[2])
        v_o = (qd_new[3], qd_new[4], qd_new[5])
        root_new = add3(root, scale3(v_o, sim_dt))
        v_root = add3(v_o, cross3(omega, scale3(v_o, sim_dt)))
        omega_q = (None, omega[0], omega[1], omega[2])
        dq = qmul(omega_q, quat0)
        q_un = tuple(sadd(quat0[a], smul(0.5 * sim_dt, dq[a])) for a in range(4))
        qnorm = jax.lax.rsqrt(_blk(sadd(sdot(q_un, q_un), 1e-12)))
        quat_new = tuple(smul(q_un[a], qnorm) for a in range(4))
        q_new = (
            list(root_new)
            + list(quat_new)
            + [sadd(qj[j], smul(sim_dt, qd_new[6 + j])) for j in range(NJ)]
        )
        qd_out = list(omega) + list(v_root) + qd_new[6:]

        # ---- per-foot diagnostics (engine.py:128-139) -------------------
        foot_f, foot_s = [], []
        for foot in range(2):
            idxs = [c for c in range(NC) if cfoot[c] == foot]
            bp, si_best, fmax = -1.0, -1.0, None
            for c in idxs:
                better = _blk(fn_c[c]) > _blk(bp)
                bp = swhere(better, fn_c[c], bp)
                si_best = swhere(better, si_c[c], si_best)
                fmax = jnp.maximum(_blk(fmax), _blk(fn_c[c])) if fmax is not None else _blk(fn_c[c])
            fmax = _blk(fmax)
            foot_f.append(fmax)
            foot_s.append(swhere(fmax > 0.0, si_best, -1.0))

        info = dict(
            foot_force=foot_f,
            foot_stone=foot_s,
            at_limit=at_limit,
            fsum=_blk(fsum),
        )
        return [_blk(x) for x in q_new], [_blk(x) for x in qd_out], info

    def kernel(*refs):
        if pd:
            (q_ref, qd_ref, tau_ref, targ_ref, pw_ref, st_ref, sr_ref,
             ug_ref, qo_ref, qdo_ref, io_ref) = refs
            pd_args = ([targ_ref[0, k] for k in range(NJ)], pw_ref[0, 0])
        else:
            (q_ref, qd_ref, tau_ref, st_ref, sr_ref, ug_ref, qo_ref,
             qdo_ref, io_ref) = refs
            pd_args = None
        q0 = [q_ref[0, k] for k in range(nq)]
        qd0 = [qd_ref[0, k] for k in range(nd)]
        tau_in = [tau_ref[0, k] for k in range(NJ)]
        sr = sr_ref[0, 0]
        ug = ug_ref[0, 0]
        # stone centers + normals once per control step (contact.py:41-51)
        st_c, st_n, st_u = [], [], []
        for s in range(n_stones):
            cx = st_ref[0, s * 6 + 0]
            cy = st_ref[0, s * 6 + 1]
            cz = st_ref[0, s * 6 + 2]
            xt = st_ref[0, s * 6 + 4]
            yt = st_ref[0, s * 6 + 5]
            sxt, cxt = jnp.sin(xt), jnp.cos(xt)
            syt, cyt = jnp.sin(yt), jnp.cos(yt)
            st_c.append((cx, cy, cz))
            n_s = (syt * cxt, -sxt, cyt * cxt)
            st_n.append(n_s)
            if support_hy is not None:
                # in-plane axes of the plank top (contact.support_axes):
                # ux = normalize(heading - (heading.n) n), uy = n x ux
                ph = st_ref[0, s * 6 + 3]
                h = (jnp.cos(ph), jnp.sin(ph), None)
                hn = sdot(h, n_s)
                ux_raw = sub3(h, scale3(n_s, hn))
                inv = jax.lax.rsqrt(_blk(sdot(ux_raw, ux_raw)) + 1e-12)
                ux = tuple(smul(c, inv) for c in ux_raw)
                st_u.append((ux, cross3(n_s, ux)))

        def body(_, carry):
            q, qd, fc, fs, ff, atl, fsum = carry
            qn, qdn, info = substep(
                list(q), list(qd), tau_in, st_c, st_n, sr, ug, pd_args, st_u
            )
            fc2 = tuple(jnp.maximum(fc[i], info["foot_force"][i]) for i in range(2))
            fs2 = tuple(
                jnp.where(info["foot_stone"][i] >= 0.0, info["foot_stone"][i], fs[i])
                for i in range(2)
            )
            ff2 = tuple(jnp.maximum(ff[i], info["foot_force"][i]) for i in range(2))
            atl2 = tuple(info["at_limit"])
            return (tuple(qn), tuple(qdn), fc2, fs2, ff2, atl2, fsum + info["fsum"])

        zero = jnp.zeros((TS, TL), jnp.float32)
        neg1 = jnp.full((TS, TL), -1.0, jnp.float32)
        init = (
            tuple(q0), tuple(qd0),
            (zero, zero), (neg1, neg1), (zero, zero),
            tuple(zero for _ in range(NJ)), zero,
        )
        q, qd, fc, fs, ff, atl, fsum = jax.lax.fori_loop(0, substeps, body, init)
        for k in range(nq):
            qo_ref[0, k] = q[k]
        for k in range(nd):
            qdo_ref[0, k] = qd[k]
        io_ref[0, 0], io_ref[0, 1] = fc[0], fc[1]
        io_ref[0, 2], io_ref[0, 3] = fs[0], fs[1]
        io_ref[0, 4], io_ref[0, 5] = ff[0], ff[1]
        for j in range(NJ):
            io_ref[0, 6 + j] = atl[j]
        io_ref[0, 6 + NJ] = fsum

    def spec_k(k):
        return pl.BlockSpec(
            (1, k, TS, TL), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )

    def pack(x, k):
        # (B, k) -> (G, k, 8, 128), env e = g*1024 + s*128 + l
        B = x.shape[0]
        return x.T.reshape(k, B // TILE, TS, TL).transpose(1, 0, 2, 3)

    def unpack(x, k):
        # (G, k, 8, 128) -> (B, k)
        return x.transpose(1, 0, 2, 3).reshape(k, -1).T

    def batched(q, qd, tau_j, *rest):
        if pd:
            target, power, stones, stone_radius, use_ground = rest
        else:
            stones, stone_radius, use_ground = rest
        B = q.shape[0]
        assert B % TILE == 0, B
        G = B // TILE
        f32 = jnp.float32
        args = [
            pack(q.astype(f32), nq),
            pack(qd.astype(f32), nd),
            pack(tau_j.astype(f32), NJ),
        ]
        specs = [spec_k(nq), spec_k(nd), spec_k(NJ)]
        if pd:
            args += [
                pack(target.astype(f32), NJ),
                pack(jnp.broadcast_to(power, (B,)).astype(f32)[:, None], 1),
            ]
            specs += [spec_k(NJ), spec_k(1)]
        args += [
            pack(stones.reshape(B, n_stones * 6).astype(f32), n_stones * 6),
            pack(jnp.broadcast_to(stone_radius, (B,)).astype(f32)[:, None], 1),
            pack(jnp.broadcast_to(use_ground, (B,)).astype(f32)[:, None], 1),
        ]
        specs += [spec_k(n_stones * 6), spec_k(1), spec_k(1)]
        qo, qdo, io = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=specs,
            out_specs=[spec_k(nq), spec_k(nd), spec_k(N_INFO)],
            out_shape=[
                jax.ShapeDtypeStruct((G, nq, TS, TL), f32),
                jax.ShapeDtypeStruct((G, nd, TS, TL), f32),
                jax.ShapeDtypeStruct((G, N_INFO, TS, TL), f32),
            ],
            interpret=interpret,
        )(*args)
        q_new = unpack(qo, nq)
        qd_new = unpack(qdo, nd)
        info = unpack(io, N_INFO)
        return (
            q_new,
            qd_new,
            dict(
                foot_contact=info[:, 0:2] > 0.0,
                foot_stone=info[:, 2:4].astype(jnp.int32),
                foot_normal_force=info[:, 4:6],
                joint_at_limit=info[:, 6:6 + NJ] > 0.5,
                contact_force_sum=info[:, 6 + NJ],
            ),
        )

    return batched
