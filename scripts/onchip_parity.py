"""On-chip Pallas kernel parity: compiled kernel vs jnp scan on the TPU.

The slow-lane interpret-mode variants (tests/test_pallas_step.py -m slow)
cost 30-40 min of CPU each for the 21-joint models; on the real chip the
same comparison runs in seconds AND validates the fp32-on-TPU numerics
the training runs actually use. Run whenever pallas_step.py or
dynamics.py changes and a chip is available:

    python scripts/onchip_parity.py

Checks Walker3D (torque, substeps 4) and Cassie (stable PD, substeps 4)
with the tolerances of tests/test_pallas_step.py. Prints one JSON line.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from steppingstone_tpu.physics import contact as ct
from steppingstone_tpu.physics import engine, pallas_step
from steppingstone_tpu.physics.dynamics import GRAVITY
from steppingstone_tpu.physics.robots.cassie import cassie
from steppingstone_tpu.physics.robots.walker3d import walker3d

B = pallas_step.TILE
N_STONES = 6


def _inputs(key, model):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    st = engine.default_state(model)
    q = jnp.tile(st.q, (B, 1))
    q = q.at[:, 2].add(0.05 * jax.random.normal(k1, (B,)))
    q = q.at[:, 7:].add(0.1 * jax.random.normal(k1, (B, model.njoints)))
    qd = 0.3 * jax.random.normal(k2, (B, model.ndof))
    tau = 20.0 * jax.random.normal(k3, (B, model.njoints))
    stones = jnp.zeros((B, N_STONES, 6))
    stones = stones.at[:, :, 0].set(jax.random.uniform(k4, (B, N_STONES), minval=-0.5, maxval=0.5))
    stones = stones.at[:, :, 1].set(jax.random.uniform(k4, (B, N_STONES), minval=-0.4, maxval=0.4))
    stones = stones.at[:, :, 2].set(jax.random.uniform(k4, (B, N_STONES), minval=-0.05, maxval=0.02))
    stones = stones.at[:, :, 4].set(0.1 * jax.random.normal(k4, (B, N_STONES)))
    stones = stones.at[:, :, 5].set(0.1 * jax.random.normal(k4, (B, N_STONES)))
    sr = jnp.full((B,), 0.25)
    ug = jnp.ones((B,), bool)
    return q, qd, tau, stones, sr, ug


def check(model, pd, substeps=4, support_hy=None):
    cparams = ct.ContactParams()
    q, qd, tau, stones, sr, ug = _inputs(jax.random.PRNGKey(0), model)
    if support_hy is not None:
        # planks need headings for their in-plane axes
        stones = stones.at[:, :, 3].set(
            0.4 * jax.random.normal(jax.random.PRNGKey(9), (B, N_STONES))
        )
    extra = ()
    if pd:
        lo = jnp.asarray(model.joint_lower)
        hi = jnp.asarray(model.joint_upper)
        target = jax.random.uniform(
            jax.random.PRNGKey(5), (B, model.njoints),
            minval=lo + 0.05, maxval=hi - 0.05,
        )
        power = jnp.full((B,), 1.0)
        tau = jnp.zeros_like(tau)
        extra = (target, power)

    if pd:
        ref = jax.jit(jax.vmap(
            lambda q_, qd_, t_, tg_, pw_, s_, r_, g_: engine._step_scan(
                model, engine.PhysicsState(q_, qd_), t_, s_, r_, g_, cparams,
                substeps, pd=(tg_, pw_), support_hy=support_hy,
            )
        ))
        st_ref, info_ref = ref(q, qd, tau, *extra, stones, sr, ug)
    else:
        ref = jax.jit(jax.vmap(
            lambda q_, qd_, t_, s_, r_, g_: engine._step_scan(
                model, engine.PhysicsState(q_, qd_), t_, s_, r_, g_, cparams,
                substeps, support_hy=support_hy,
            )
        ))
        st_ref, info_ref = ref(q, qd, tau, stones, sr, ug)

    fn = pallas_step.build_batched_step(
        model, cparams, substeps, N_STONES,
        engine.SIM_DT, engine.LIMIT_K, engine.LIMIT_C, engine.MAX_QD, GRAVITY,
        pd=pd, support_hy=support_hy,
    )
    qn, qdn, d = jax.jit(fn)(q, qd, tau, *extra, stones, sr, ug)

    q_err = float(np.abs(np.asarray(qn) - np.asarray(st_ref.q)).max())
    qd_err = float(np.abs(np.asarray(qdn) - np.asarray(st_ref.qd)).max())
    fc = float(np.mean(np.asarray(d["foot_contact"]) == np.asarray(info_ref.foot_contact)))
    out = {
        "model": model.name, "pd": pd, "substeps": substeps,
        "support": "disc" if support_hy is None else f"plank(hy={support_hy})",
        "max_q_err": round(q_err, 6), "max_qd_err": round(qd_err, 4),
        "foot_contact_agreement": round(fc, 5),
        "pass": bool(q_err < 5e-4 and qd_err < 5e-2 and fc > 0.999),
    }
    print(json.dumps(out), flush=True)
    return out


def check_padded_dispatch(model, bs=64, substeps=4):
    """Sub-tile batch through the PUBLIC dispatch (engine.step under vmap
    pads bs -> TILE for the kernel, engine._pad_to_tile) vs the jnp scan —
    guards the deterministic test fleet's fast path."""
    cparams = ct.ContactParams()
    q, qd, tau, stones, sr, ug = _inputs(jax.random.PRNGKey(3), model)
    q, qd, tau, stones, sr, ug = (x[:bs] for x in (q, qd, tau, stones, sr, ug))

    disp = jax.jit(jax.vmap(
        lambda q_, qd_, t_, s_, r_, g_: engine.step(
            model, engine.PhysicsState(q_, qd_), t_, s_, r_, g_, cparams,
            substeps,
        )
    ))
    st, _ = disp(q, qd, tau, stones, sr, ug)
    ref = jax.jit(jax.vmap(
        lambda q_, qd_, t_, s_, r_, g_: engine._step_scan(
            model, engine.PhysicsState(q_, qd_), t_, s_, r_, g_, cparams,
            substeps,
        )
    ))
    st_ref, _ = ref(q, qd, tau, stones, sr, ug)
    q_err = float(np.abs(np.asarray(st.q) - np.asarray(st_ref.q)).max())
    qd_err = float(np.abs(np.asarray(st.qd) - np.asarray(st_ref.qd)).max())
    out = {
        "model": model.name, "pd": False, "substeps": substeps,
        "support": f"disc (padded dispatch, batch {bs})",
        "max_q_err": round(q_err, 6), "max_qd_err": round(qd_err, 4),
        "foot_contact_agreement": 1.0,
        "pass": bool(q_err < 5e-4 and qd_err < 5e-2),
    }
    print(json.dumps(out), flush=True)
    return out


def main(out_path=None):
    results = [
        check(walker3d(), pd=False),
        check(cassie(), pd=True),
        check(walker3d(), pd=False, support_hy=1.5),
        check(cassie(), pd=True, support_hy=1.5),
        check_padded_dispatch(walker3d()),
    ]
    if out_path:
        with open(out_path, "w") as f:
            json.dump({
                "backend": jax.default_backend(),
                "results": results,
                "pass": all(r["pass"] for r in results),
            }, f, indent=2)
    assert all(r["pass"] for r in results), results
    return results


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
