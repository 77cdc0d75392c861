"""Functional stepping-stone environments (Walker3D / Mike / Cassie).

On-device replacement for the reference's `mocca_envs` stepper envs, built
to the call-site contract of SURVEY.md §2.9:

- obs/action dims pinned by the reference checkpoints (§2.8):
  Walker3D/Mike 60/21, Cassie 51/10
- `update_terrain` event semantics: True on the control step where the
  character hits the target stone and the next-next stone is (re)sampled
- `create_temp_states`: hypothetical observations for all 11x11 candidate
  placements of the upcoming stone, scored by the critic ensemble to drive
  curriculum sampling (reference `train.py:338-341`)
- curriculum levels 0..5 and the 11x11 sampling-probability grid
- mirror-index metadata for mirror-symmetry augmentation
  (reference `envs_utils.py:687-740`)
- auto-reset inside `step` (reference worker loop `envs_utils.py:646-649`)
  with `TimeLimitMask`-style bad-transition flags (`envs_utils.py:59-65`)

Everything is a pure function of (state, action); batching is `vmap` over
the leading axis of `EnvState` (see envs/vector.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from steppingstone_tpu.core import quaternion as qt
from steppingstone_tpu.envs import terrain as terr
from steppingstone_tpu.physics import engine
from steppingstone_tpu.physics.contact import ContactParams
from steppingstone_tpu.physics.engine import PhysicsState
from steppingstone_tpu.physics.model import RobotModel
from steppingstone_tpu.physics.robots import cassie as cassie_mod
from steppingstone_tpu.physics.robots import walker3d as walker_mod

CONTROL_DT = engine.SIM_DT * engine.SUBSTEPS  # 60 Hz


class EnvState(NamedTuple):
    phys: PhysicsState
    terrain: jnp.ndarray          # (NS, 6)
    next_step_index: jnp.ndarray  # () int32
    elapsed: jnp.ndarray          # () int32
    prev_dist: jnp.ndarray        # () f32 distance to current target
    cur: terr.CurriculumState
    key: jax.Array
    ep_return: jnp.ndarray        # () f32 running episode return
    update_terrain: jnp.ndarray   # () bool
    foot_contact: jnp.ndarray     # (2,) bool from the last control step
    phase: jnp.ndarray            # () f32 gait clock in [0, 1) (Cassie obs)
    mirror_enabled: jnp.ndarray   # () bool — reference `set_mirror` flag
    mirror_episode: jnp.ndarray   # () bool — this episode runs mirrored
    robot_power: jnp.ndarray      # () f32 torque scale (set_robot_params)
    stone_radius: jnp.ndarray     # () f32 disc radius (set_env_params)


class StepOut(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray        # episode ended this step (fall/timeout/success)
    timeout: jnp.ndarray     # ended *only* because of the time limit
    ep_return: jnp.ndarray   # final return of the episode that just ended (else 0)
    ep_len: jnp.ndarray      # final length of the episode that just ended (else 0)
    hit: jnp.ndarray         # target stone reached this step


@dataclasses.dataclass(frozen=True, eq=False)
class StepperConfig:
    """Static env description (hashable by identity; safe as jit-static)."""

    name: str
    model: RobotModel
    actuation: str              # "torque" | "pd"
    obs_dim: int
    n_stones: int = 24
    stone_radius: float = 0.25
    max_episode_steps: int = 1000
    lookahead: int = 2
    tall_threshold: float = 0.6   # min root height above support stone
    step_bonus: float = 50.0
    final_bonus: float = 100.0
    tall_bonus: float = 2.0
    progress_weight: float = 1.0
    energy_cost: float = 0.12
    limit_cost: float = 0.3
    clock_period: int = 0       # control steps per gait cycle (0 = no clock obs)
    contact: ContactParams = ContactParams()
    reset_noise: float = 0.03

    @property
    def action_dim(self) -> int:
        return self.model.action_dim

    @property
    def max_episode_steps_attr(self) -> int:
        """Reference `_max_episode_steps` analog (`envs_utils.py:62`)."""
        return self.max_episode_steps


# ----------------------------------------------------------------------
# observation
# ----------------------------------------------------------------------

def _heading_frame(quat):
    """Heading angle and the 2D rotation into the heading frame."""
    psi = qt.heading(quat)
    c, s = jnp.cos(psi), jnp.sin(psi)
    return psi, c, s


def _target_features(cfg, root_pos, psi, c, s, stone):
    """(4,) egocentric features of one target stone: sin/cos of the bearing
    error, horizontal distance, height difference."""
    d = stone[:3] - root_pos
    bearing = jnp.arctan2(d[1], d[0]) - psi
    r_h = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + 1e-12)
    return jnp.stack([jnp.sin(bearing), jnp.cos(bearing), r_h, d[2]])


def observe(cfg: StepperConfig, state: EnvState) -> jnp.ndarray:
    return observe_with_terrain(cfg, state, state.terrain)


def _mirror_active(cfg: StepperConfig, state: EnvState) -> jnp.ndarray:
    """Phase-mirror gate (reference `set_mirror` / `use_phase_mirror`,
    SURVEY.md §2.9 [reconstructed]): clocked envs (Cassie) mirror during
    the second half of the gait cycle; unclocked envs mirror alternate
    episodes (drawn at reset)."""
    if cfg.clock_period:
        return state.mirror_enabled & (state.phase >= 0.5)
    return state.mirror_enabled & state.mirror_episode


def observe_with_terrain(
    cfg: StepperConfig, state: EnvState, terrain: jnp.ndarray
) -> jnp.ndarray:
    """Observation, optionally with a hypothetical terrain (for temp states)."""
    model = cfg.model
    q, qd = state.phys.q, state.phys.qd
    root_pos, quat, qj = q[0:3], q[3:7], q[7:]
    omega, vel = qd[0:3], qd[3:6]
    psi, ch, sh = _heading_frame(quat)

    ns = state.next_step_index
    support = terrain[jnp.maximum(ns - 1, 0)]
    height = root_pos[2] - support[2]

    target = terrain[jnp.clip(ns, 0, cfg.n_stones - 1)]
    d = target[:3] - root_pos
    bearing = jnp.arctan2(d[1], d[0]) - psi

    v_head = jnp.stack(
        [ch * vel[0] + sh * vel[1], -sh * vel[0] + ch * vel[1], vel[2]]
    )
    yaw, pitch, roll = qt.to_euler_zyx(quat)

    parts = [
        jnp.stack([height, jnp.sin(bearing), jnp.cos(bearing)]),
        v_head,
        jnp.stack([roll, pitch]),
    ]
    if cfg.clock_period:
        # body-frame angular velocity + gait clock (Cassie layout)
        w_body = qt.rotate_inv(quat, omega)
        parts.append(w_body)
    parts.append(qj)
    parts.append(qd[6:] * 0.1)
    parts.append(state.foot_contact.astype(q.dtype))
    if cfg.clock_period:
        ang = 2 * jnp.pi * state.phase
        parts.append(jnp.stack([jnp.sin(ang), jnp.cos(ang)]))
    for k in range(cfg.lookahead):
        stone = terrain[jnp.clip(ns + k, 0, cfg.n_stones - 1)]
        parts.append(_target_features(cfg, root_pos, psi, ch, sh, stone))
    obs = jnp.concatenate(parts)
    assert obs.shape == (cfg.obs_dim,), (obs.shape, cfg.obs_dim)
    return obs


def create_temp_states(cfg: StepperConfig, state: EnvState) -> jnp.ndarray:
    """(121, obs_dim) hypothetical observations, one per candidate placement
    of the *next-next* stone over the (yaw, pitch) grid — the on-device
    `create_temp_states` (reference `train.py:338`, `envs_utils.py:573-578`)."""
    cand_idx = jnp.clip(state.next_step_index + 1, 0, cfg.n_stones - 1)
    cands = terr.candidate_stones(state.terrain, cand_idx)  # (121, 6)

    def one(stone):
        t = state.terrain.at[cand_idx].set(stone)
        return observe_with_terrain(cfg, state, t)

    return jax.vmap(one)(cands)


def get_temp_state(cfg: StepperConfig, state: EnvState) -> jnp.ndarray:
    """Single hypothetical obs for the current terrain (reference
    `enjoy.py:55-57`)."""
    return observe(cfg, state)


# ----------------------------------------------------------------------
# reset / step
# ----------------------------------------------------------------------

def _standing_height(cfg: StepperConfig) -> float:
    """Root height such that the lowest contact sphere touches z=0 in the
    init pose (computed once at env-build time, outside jit)."""
    from steppingstone_tpu.physics import kinematics as km

    model = cfg.model
    st = engine.default_state(model)
    kin = km.forward_kinematics(model, st.q)
    pts = km.contact_points(model, kin)
    low = jnp.min(pts[:, 2] - jnp.asarray(model.contact_radius))
    return float(st.q[2] - low)


@dataclasses.dataclass(frozen=True, eq=False)
class StepperEnv:
    """Bundles the static config with reset/step/observe closures."""

    cfg: StepperConfig
    standing_height: float
    # mirror transform tables, precomputed from get_mirror_indices()
    mirror_sign_obs: np.ndarray = None
    mirror_perm_obs: np.ndarray = None
    mirror_sign_act: np.ndarray = None
    mirror_perm_act: np.ndarray = None

    def _mirror_obs(self, obs):
        return obs[..., self.mirror_perm_obs] * jnp.asarray(self.mirror_sign_obs)

    def _mirror_act(self, act):
        return act[..., self.mirror_perm_act] * jnp.asarray(self.mirror_sign_act)

    # -- gym-space analogs ------------------------------------------------
    @property
    def observation_dim(self) -> int:
        return self.cfg.obs_dim

    @property
    def action_dim(self) -> int:
        return self.cfg.action_dim

    @property
    def _max_episode_steps(self) -> int:
        return self.cfg.max_episode_steps

    # reference `yaw_samples` / `pitch_samples` / `r_samples` (§2.9)
    @property
    def yaw_samples(self) -> np.ndarray:
        return terr.YAW_SAMPLES

    @property
    def pitch_samples(self) -> np.ndarray:
        return terr.PITCH_SAMPLES

    @property
    def r_samples(self) -> np.ndarray:
        return terr.R_SAMPLES

    def reset(
        self,
        key: jax.Array,
        cur: terr.CurriculumState | None = None,
        mirror_enabled: jnp.ndarray | None = None,
    ):
        cfg = self.cfg
        model = cfg.model
        if cur is None:
            cur = terr.default_curriculum()
        if mirror_enabled is None:
            mirror_enabled = jnp.asarray(False)
        k_terr, k_noise, k_state, k_mir = jax.random.split(key, 4)
        terrain = terr.generate_terrain(k_terr, cur, cfg.n_stones)

        base = engine.default_state(model)
        nj = model.njoints
        noise = cfg.reset_noise * jax.random.normal(k_noise, (2 * nj + 3,))
        q = base.q.at[7:].add(noise[:nj])
        q = q.at[0:2].set(jnp.array([0.22, 0.0]))
        q = q.at[2].set(self.standing_height + 0.015)
        qd = base.qd.at[6:].set(0.1 * noise[nj:2 * nj])
        qd = qd.at[3:5].add(0.1 * noise[2 * nj:2 * nj + 2])

        phys = PhysicsState(q=q, qd=qd)
        state = EnvState(
            phys=phys,
            terrain=terrain,
            next_step_index=jnp.asarray(1, jnp.int32),
            elapsed=jnp.asarray(0, jnp.int32),
            prev_dist=jnp.asarray(0.0, jnp.float32),
            cur=cur,
            key=k_state,
            ep_return=jnp.asarray(0.0, jnp.float32),
            update_terrain=jnp.asarray(False),
            foot_contact=jnp.zeros(2, dtype=bool),
            phase=jnp.asarray(0.0, jnp.float32),
            mirror_enabled=jnp.asarray(mirror_enabled),
            mirror_episode=jax.random.bernoulli(k_mir),
            robot_power=jnp.asarray(1.0, jnp.float32),
            stone_radius=jnp.asarray(cfg.stone_radius, jnp.float32),
        )
        state = state._replace(prev_dist=self._target_dist(state))
        obs = observe(cfg, state)
        obs = jnp.where(_mirror_active(cfg, state), self._mirror_obs(obs), obs)
        return state, obs

    def _target_dist(self, state: EnvState) -> jnp.ndarray:
        cfg = self.cfg
        tgt = state.terrain[jnp.clip(state.next_step_index, 0, cfg.n_stones - 1)]
        return jnp.linalg.norm(tgt[:3] - state.phys.q[0:3])

    def step(self, state: EnvState, action: jnp.ndarray):
        cfg = self.cfg
        model = cfg.model
        # phase-mirror: the policy acts in mirrored coordinates; un-mirror
        # its action before it touches the dynamics (reference `set_mirror`)
        action = jnp.where(
            _mirror_active(cfg, state), self._mirror_act(action), action
        )
        qj, qdj = state.phys.q[7:], state.phys.qd[6:]
        if cfg.actuation == "pd":
            tau = engine.pd_actuation(model, action, qj, qdj)
        else:
            tau = engine.torque_actuation(model, action, qj, qdj)
        tau = tau * state.robot_power  # set_robot_params power scaling

        phys, info = engine.step(
            model, state.phys, tau, state.terrain, state.stone_radius,
            jnp.asarray(False), cfg.contact,
        )

        # ---- step-hit detection & terrain resampling -----------------
        ns = state.next_step_index
        hit = jnp.any((info.foot_stone == ns) & info.foot_contact)
        last = cfg.n_stones - 1
        reached_final = hit & (ns >= last)
        ns_new = jnp.where(hit, jnp.minimum(ns + 1, last), ns)
        k_resample, k_next = jax.random.split(state.key)
        terrain = jax.lax.cond(
            hit,
            lambda t: terr.resample_stone(k_resample, t, ns_new + 1, state.cur),
            lambda t: t,
            state.terrain,
        )

        mid = state._replace(
            phys=phys,
            terrain=terrain,
            next_step_index=ns_new,
            key=k_next,
            foot_contact=info.foot_contact,
            phase=jnp.where(
                cfg.clock_period > 0,
                (state.phase + 1.0 / max(cfg.clock_period, 1)) % 1.0,
                state.phase,
            ),
        )

        # ---- reward ---------------------------------------------------
        new_dist = self._target_dist(mid)
        # on a hit the target switched: don't score the target jump
        progress = jnp.where(
            hit, 0.0, (state.prev_dist - new_dist) / CONTROL_DT
        ) * cfg.progress_weight

        support = terrain[jnp.maximum(ns_new - 1, 0)]
        height = phys.q[2] - support[2]
        tall = height > cfg.tall_threshold * (self.standing_height / 0.95)

        act_idx = model.actuated_idx
        energy = cfg.energy_cost * jnp.mean(
            jnp.abs(jnp.clip(action, -1, 1)) * jnp.abs(qdj[act_idx]) * 0.1
        )
        limit_pen = cfg.limit_cost * jnp.mean(info.joint_at_limit.astype(jnp.float32))

        reward = (
            progress
            + jnp.where(tall, cfg.tall_bonus, -1.0)
            + jnp.where(hit, cfg.step_bonus, 0.0)
            + jnp.where(reached_final, cfg.final_bonus, 0.0)
            - energy
            - limit_pen
        )

        # ---- termination ---------------------------------------------
        elapsed = state.elapsed + 1
        timeout = elapsed >= cfg.max_episode_steps
        fall = ~tall
        done = fall | timeout | reached_final
        ep_return = state.ep_return + reward

        mid = mid._replace(
            elapsed=elapsed,
            prev_dist=new_dist,
            ep_return=ep_return,
            update_terrain=hit,
        )

        # ---- auto-reset (reference worker `envs_utils.py:646-649`) ----
        k_reset, k_keep = jax.random.split(k_next)
        reset_state, reset_obs = self.reset(
            k_reset, state.cur, state.mirror_enabled
        )
        out_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b),
            reset_state,
            mid._replace(key=k_keep),
        )
        # injected params persist across auto-resets (the reference's
        # set_env_params/set_robot_params are sticky per worker)
        out_state = out_state._replace(
            robot_power=mid.robot_power, stone_radius=mid.stone_radius
        )
        cont_obs = observe(cfg, mid)
        cont_obs = jnp.where(
            _mirror_active(cfg, mid), self._mirror_obs(cont_obs), cont_obs
        )
        obs = jnp.where(done, reset_obs, cont_obs)

        return out_state, StepOut(
            obs=obs,
            reward=reward,
            done=done,
            timeout=timeout & ~fall & ~reached_final,
            ep_return=jnp.where(done, ep_return, 0.0),
            ep_len=jnp.where(done, elapsed, 0).astype(jnp.int32),
            hit=hit,
        )

    # ---- curriculum RPC analogs (reference `envs_utils.py:560-590`) ---
    def set_env_params(self, state: EnvState, params: dict) -> EnvState:
        """Generic env-param injection (reference envs_utils.py:560-563).
        Supported keys: stone_radius."""
        if "stone_radius" in params:
            state = state._replace(
                stone_radius=jnp.broadcast_to(
                    jnp.asarray(params["stone_radius"], jnp.float32),
                    state.stone_radius.shape,
                )
            )
        return state

    def set_robot_params(self, state: EnvState, params: dict) -> EnvState:
        """Generic robot-param injection (reference envs_utils.py:564-566).
        Supported keys: power (torque scale)."""
        if "power" in params:
            state = state._replace(
                robot_power=jnp.broadcast_to(
                    jnp.asarray(params["power"], jnp.float32),
                    state.robot_power.shape,
                )
            )
        return state

    def set_mirror(self, state: EnvState, enabled: bool) -> EnvState:
        """Reference `set_mirror(bool)` fan-out (envs_utils.py:588-590)."""
        return state._replace(
            mirror_enabled=jnp.broadcast_to(
                jnp.asarray(enabled), state.mirror_enabled.shape
            )
        )

    def update_curriculum(self, state: EnvState, level) -> EnvState:
        cur = state.cur._replace(
            level=jnp.asarray(level, jnp.int32),
            use_prob=jnp.asarray(False),
        )
        return state._replace(cur=cur)

    def update_sample_prob(self, state: EnvState, prob: jnp.ndarray) -> EnvState:
        prob = prob / (jnp.sum(prob) + 1e-12)
        cur = state.cur._replace(sample_prob=prob, use_prob=jnp.asarray(True))
        return state._replace(cur=cur)

    # ---- mirror metadata (reference `get_mirror_indices`) -------------
    def get_mirror_indices(self):
        """Six index lists: (neg_obs, right_obs, left_obs, neg_act,
        right_act, left_act) — reference `envs_utils.py:687-694`."""
        cfg = self.cfg
        mir = walker_mod.MIRROR if cfg.actuation == "torque" else cassie_mod.MIRROR
        nj = cfg.model.njoints
        base = 11 if cfg.clock_period else 8  # where joint angles start
        jpos = lambda j: base + j
        jvel = lambda j: base + nj + j
        contact0 = base + 2 * nj
        neg_obs = [1, 4, 6]
        if cfg.clock_period:
            neg_obs += [8, 10]  # body angular velocity x, z
        neg_obs += [jpos(j) for j in mir["neg_joints"]]
        neg_obs += [jvel(j) for j in mir["neg_joints"]]
        # target sin(bearing) features
        tgt0 = contact0 + 2 + (2 if cfg.clock_period else 0)
        neg_obs += [tgt0 + 4 * k for k in range(cfg.lookahead)]
        right_obs = (
            [jpos(j) for j in mir["right_joints"]]
            + [jvel(j) for j in mir["right_joints"]]
            + [contact0]
        )
        left_obs = (
            [jpos(j) for j in mir["left_joints"]]
            + [jvel(j) for j in mir["left_joints"]]
            + [contact0 + 1]
        )
        if cfg.actuation == "pd":
            amir = cassie_mod.MIRROR_ACTION
            neg_act = amir["neg_actions"]
            right_act = amir["right_actions"]
            left_act = amir["left_actions"]
        else:
            neg_act = mir["neg_joints"]
            right_act = mir["right_joints"]
            left_act = mir["left_joints"]
        return (
            np.array(neg_obs), np.array(right_obs), np.array(left_obs),
            np.array(neg_act), np.array(right_act), np.array(left_act),
        )


# ----------------------------------------------------------------------
# constructors
# ----------------------------------------------------------------------

def _make(cfg: StepperConfig) -> StepperEnv:
    env = StepperEnv(cfg=cfg, standing_height=_standing_height(cfg))
    neg_o, r_o, l_o, neg_a, r_a, l_a = env.get_mirror_indices()

    def tables(n, neg, right, left):
        sign = np.ones(n, dtype=np.float32)
        sign[neg] = -1.0
        perm = np.arange(n)
        perm[np.concatenate([right, left])] = perm[np.concatenate([left, right])]
        return sign, perm

    so, po = tables(cfg.obs_dim, neg_o, r_o, l_o)
    sa, pa = tables(cfg.action_dim, neg_a, r_a, l_a)
    return dataclasses.replace(
        env, mirror_sign_obs=so, mirror_perm_obs=po,
        mirror_sign_act=sa, mirror_perm_act=pa,
    )


def walker3d_stepper() -> StepperEnv:
    return _make(StepperConfig(
        name="Walker3DStepperEnv-v0",
        model=walker_mod.walker3d(),
        actuation="torque",
        obs_dim=60,
    ))


def mike_stepper() -> StepperEnv:
    return _make(StepperConfig(
        name="MikeStepperEnv-v0",
        model=walker_mod.mike(),
        actuation="torque",
        obs_dim=60,
    ))


def cassie_stepper() -> StepperEnv:
    return _make(StepperConfig(
        name="CassieStepper-v1",
        model=cassie_mod.cassie(),
        actuation="pd",
        obs_dim=51,
        tall_threshold=0.55,
        clock_period=30,
    ))
