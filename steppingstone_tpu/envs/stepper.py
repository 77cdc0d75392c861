"""Functional stepping-stone environments (Walker3D / Mike / Cassie).

On-device replacement for the reference's `mocca_envs` stepper envs, built
to the call-site contract of SURVEY.md §2.9:

- obs/action dims pinned by the reference checkpoints (§2.8):
  Walker3D/Mike 60/21, Cassie 51/10
- Walker-family observation layout follows the upstream mocca_envs
  convention the checkpoints were trained on:
  [height-above-lowest-foot, vx, vy, vz (heading frame), roll, pitch]
  + 21 limit-normalized joint angles + 21 joint speeds * 0.1
  + 2 foot contacts + 2 lookahead targets x (sin(a)*d, cos(a)*d, dz,
  x_tilt, y_tilt) = 6 + 42 + 2 + 10 = 60
- reward = progress-potential + step bonus 50*exp(-d/0.25) + target bonus
  + tall bonus (+2/-1) - electricity/stall-torque/joint-limit/posture
  penalties; episode ends on fall (height < termination), stall
  (stall_timeout steps with no new stone hit — see StepperConfig), or
  timeout
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
from steppingstone_tpu.physics import kinematics as km
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
    prev_dist: jnp.ndarray        # () f32 horiz distance to the walk target
    cur: terr.CurriculumState
    key: jax.Array
    ep_return: jnp.ndarray        # () f32 running episode return
    update_terrain: jnp.ndarray   # () bool
    foot_contact: jnp.ndarray     # (2,) bool from the last control step
    foot_xyz: jnp.ndarray         # (2, 3) foot link origins (world)
    phase: jnp.ndarray            # () f32 gait clock in [0, 1) (Cassie obs)
    last_hit: jnp.ndarray         # () int32 elapsed at the last stone hit
    mirror_enabled: jnp.ndarray   # () bool — reference `set_mirror` flag
    mirror_episode: jnp.ndarray   # () bool — this episode runs mirrored
    robot_power: jnp.ndarray      # () f32 torque scale (set_robot_params)
    stone_radius: jnp.ndarray     # () f32 disc radius (set_env_params)


class StepOut(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray        # episode ended this step (fall/timeout)
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
    n_stones: int = 20
    stone_radius: float = 0.25
    max_episode_steps: int = 1000
    lookahead: int = 2
    # reward constants (upstream mocca_envs conventions)
    termination_height: float = 0.7   # fall when root-above-feet drops below
    step_bonus: float = 50.0
    step_bonus_scale: float = 0.25    # 50 * exp(-dist / 0.25)
    target_bonus: float = 2.0         # per step standing at the final stone
    tall_bonus: float = 2.0
    # Stall timeout: terminate (as a fall, no explicit penalty) when no NEW
    # stone has been hit for this many control steps, except at the final
    # stone (standing there is the intended success, mocca target_bonus).
    # Rationale: the tall bonus (+2/step to the 1000-step horizon ~ 2000)
    # otherwise makes standing still a reward optimum that beats risky
    # stepping AND clears the curriculum-advance bar (mean > 1000) without
    # walking — observed twice (commit d279f44 on discs; the round-4
    # plank A/B, reports/behavior_ab_plank.json: 0.55 stones/episode,
    # x=0.4 m, mean 1814 by standing). With the timeout, standing earns
    # at most ~2*stall_timeout ~ 360 < any walking episode. The running
    # start (below) makes standing non-trivial to reach; this makes it
    # strictly dominated. 3 s is generous: steps take 0.5-1 s.
    stall_timeout: int = 180
    electricity_cost: float = 4.5     # * mean(|a| * |0.1 qd|)
    stall_torque_cost: float = 0.225  # * mean(a^2)
    joints_at_limit_cost: float = 0.1  # * count(|norm angle| > 0.99)
    clock_period: int = 0       # control steps per gait cycle (0 = no clock obs)
    contact: ContactParams = ContactParams()
    reset_noise: float = 0.05
    # "running start" (mocca set_base_pose(pose="running_start"),
    # SURVEY §2.9): spawn mid-stride with forward momentum. Without it the
    # policy converges to a stand-still local optimum — the tall bonus
    # (+2/step forever, V ~ 2/(1-gamma) = 200) strictly dominates a risky
    # first step (+50 once, then a likely fall), and a 2e8-frame run
    # verified the learned policy never leaves its spawn point. Starting
    # at walking speed makes standing unreachable from reset, so stepping
    # experience (and its higher long-run reward) is guaranteed.
    init_forward_speed: float = 1.2
    # ---- support geometry (reference `plank_class`, SURVEY.md §2.9) ----
    # The reference's stepper envs walk on plank-type support objects
    # (mocca bullet_objects Pillar/Plank/LargePlank) chosen as a STATIC
    # env kwarg, not coupled to the difficulty level. Modes here:
    #   "disc"   — shrinking-disc curriculum (round-2/3 behavior): the
    #              effective contact radius starts stone_radius +
    #              radius_extra at level 0 (0.6 m discs overlap into a
    #              walkway at 0.65-0.75 m spacing) and shrinks linearly
    #              to stone_radius at level 5. Stacks support difficulty
    #              on top of the yaw/pitch widening — level 5 is tiny
    #              discs + full ranges simultaneously, plausibly HARDER
    #              than the reference's hardest setting (see
    #              reports/CALIBRATION.md).
    #   "pillar" — static disc of radius stone_radius at every level
    #              (mocca Pillar: cylinder, r=0.25).
    #   "plank"  — static box: half-extent stone_radius along the stone's
    #              heading (walking direction), plank_hy laterally (mocca
    #              Plank/LargePlank: boxes elongated laterally, so
    #              lateral foot placement is forgiving and difficulty
    #              comes from the yaw/pitch/tilt/spacing ranges alone).
    support: str = "disc"
    plank_hy: float = 1.5
    radius_extra: float = 0.35

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

def _norm_angles(model: RobotModel, qj: jnp.ndarray) -> jnp.ndarray:
    """Joint angles normalized to [-1, 1] by the position limits (the
    pybullet `current_relative_position` convention mocca_envs observes)."""
    lo = jnp.asarray(model.joint_lower, dtype=qj.dtype)
    hi = jnp.asarray(model.joint_upper, dtype=qj.dtype)
    mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
    return (qj - mid) / half


def _target_rows(cfg: StepperConfig, terrain: jnp.ndarray, ns: jnp.ndarray):
    """The `lookahead` stones starting at `next_step_index` (clipped so the
    last stone repeats, like mocca's delta_to_k_targets)."""
    idx = jnp.clip(ns + jnp.arange(cfg.lookahead), 0, cfg.n_stones - 1)
    return terrain[idx]  # (k, 6)


def _target_features(rows: jnp.ndarray, root_pos: jnp.ndarray, yaw):
    """(k, 5) egocentric stone features: (sin(a)*d, cos(a)*d, dz, x_tilt,
    y_tilt) — mocca delta_to_k_targets."""
    deltas = rows[:, 0:3] - root_pos
    a = jnp.arctan2(deltas[:, 1], deltas[:, 0]) - yaw
    d = jnp.sqrt(deltas[:, 0] ** 2 + deltas[:, 1] ** 2 + 1e-12)
    return jnp.stack(
        [jnp.sin(a) * d, jnp.cos(a) * d, deltas[:, 2], rows[:, 4], rows[:, 5]],
        axis=1,
    )


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
    vel = qd[3:6]
    yaw, pitch, roll = qt.to_euler_zyx(quat)
    ch, sh = jnp.cos(yaw), jnp.sin(yaw)

    height = root_pos[2] - jnp.min(state.foot_xyz[:, 2])
    v_head = jnp.stack(
        [ch * vel[0] + sh * vel[1], -sh * vel[0] + ch * vel[1], vel[2]]
    )
    ns = state.next_step_index
    tgt_rows = _target_rows(cfg, terrain, ns)
    tgt = _target_features(tgt_rows, root_pos, yaw)

    if cfg.clock_period:
        # Cassie layout (51-dim): bearing header + body rates + gait clock
        target0 = tgt_rows[0]
        d = target0[:3] - root_pos
        bearing = jnp.arctan2(d[1], d[0]) - yaw
        omega = qd[0:3]
        w_body = qt.rotate_inv(quat, omega)
        ang = 2 * jnp.pi * state.phase
        r_h = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + 1e-12)
        parts = [
            jnp.stack([height, jnp.sin(bearing), jnp.cos(bearing)]),
            v_head,
            jnp.stack([roll, pitch]),
            w_body,
            qj,
            qd[6:] * 0.1,
            state.foot_contact.astype(q.dtype),
            jnp.stack([jnp.sin(ang), jnp.cos(ang)]),
            tgt[:, :4].reshape(-1),  # (sin*d, cos*d, dz, x_tilt) x k
        ]
    else:
        # Walker3D/Mike layout (60-dim), mocca_envs WalkerBase.calc_state +
        # delta_to_k_targets
        parts = [
            jnp.stack([height, v_head[0], v_head[1], v_head[2], roll, pitch]),
            _norm_angles(model, qj),
            qd[6:] * 0.1,
            state.foot_contact.astype(q.dtype),
            tgt.reshape(-1),
        ]
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
    model = cfg.model
    st = engine.default_state(model)
    kin = km.forward_kinematics(model, st.q)
    pts = km.contact_points(model, kin)
    low = jnp.min(pts[:, 2] - jnp.asarray(model.contact_radius))
    return float(st.q[2] - low)


def _foot_xyz(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """(2, 3) world foot link origins (mocca feet_xyz: f.pose().xyz())."""
    kin = km.forward_kinematics(model, q)
    fb = _foot_bodies(model)
    return kin.pos[jnp.asarray(fb)]


def _foot_bodies(model: RobotModel) -> tuple:
    right = int(model.contact_body[np.argmax(model.foot_of_contact == 0)])
    left = int(model.contact_body[np.argmax(model.foot_of_contact == 1)])
    return right, left


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
        q0j = base.q[7:]
        if cfg.actuation == "torque":
            # mocca "running_start" pose offsets
            off = np.zeros(nj, dtype=np.float32)
            for jn, v in walker_mod.RUNNING_START.items():
                off[list(model.joint_names).index(jn)] = v
            q0j = q0j + jnp.asarray(off)
        noise = cfg.reset_noise * jax.random.normal(k_noise, (2 * nj + 3,))
        lo = jnp.asarray(model.joint_lower)
        hi = jnp.asarray(model.joint_upper)
        qj = jnp.clip(q0j + noise[:nj], lo + 0.01, hi - 0.01)
        q = base.q.at[7:].set(qj)
        q = q.at[0:2].set(jnp.array([0.3, 0.0]))
        q = q.at[2].set(self.standing_height + 0.015)
        qd = base.qd.at[6:].set(0.1 * noise[nj:2 * nj])
        qd = qd.at[3:5].add(0.1 * noise[2 * nj:2 * nj + 2])
        qd = qd.at[3].add(cfg.init_forward_speed)

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
            foot_xyz=_foot_xyz(model, q),
            phase=jnp.asarray(0.0, jnp.float32),
            last_hit=jnp.asarray(0, jnp.int32),
            mirror_enabled=jnp.asarray(mirror_enabled),
            mirror_episode=jax.random.bernoulli(k_mir),
            robot_power=jnp.asarray(1.0, jnp.float32),
            stone_radius=jnp.asarray(cfg.stone_radius, jnp.float32),
        )
        state = state._replace(prev_dist=self._target_dist(state))
        obs = observe(cfg, state)
        obs = jnp.where(_mirror_active(cfg, state), self._mirror_obs(obs), obs)
        return state, obs

    def _walk_target(self, terrain, ns):
        """The potential target: LAST of the k lookahead stones (mocca
        walk_target_index = -1), i.e. the stone after the immediate one."""
        cfg = self.cfg
        idx = jnp.clip(ns + cfg.lookahead - 1, 0, cfg.n_stones - 1)
        return terrain[idx]

    def _target_dist(self, state: EnvState) -> jnp.ndarray:
        tgt = self._walk_target(state.terrain, state.next_step_index)
        d = tgt[:2] - state.phys.q[0:2]
        return jnp.sqrt(d[0] ** 2 + d[1] ** 2 + 1e-12)

    def step(self, state: EnvState, action: jnp.ndarray):
        cfg = self.cfg
        model = cfg.model
        last = cfg.n_stones - 1
        # phase-mirror: the policy acts in mirrored coordinates; un-mirror
        # its action before it touches the dynamics (reference `set_mirror`)
        action = jnp.where(
            _mirror_active(cfg, state), self._mirror_act(action), action
        )
        qj, qdj = state.phys.q[7:], state.phys.qd[6:]
        # support geometry (see StepperConfig.support)
        if cfg.support == "disc":
            # shrinking-disc support curriculum (radius_extra); keyed on
            # cur.assist (== cur.level for fixed-curriculum runs) so
            # grid-mode sampling strategies get the same learnability ramp
            r_eff = state.stone_radius + cfg.radius_extra * (
                1.0 - terr.level_scale(state.cur.assist)
            )
            hy = None
        elif cfg.support == "pillar":
            r_eff, hy = state.stone_radius, None
        elif cfg.support == "plank":
            # same walking-direction assist as disc mode: at level 0 the
            # planks overlap into a carpet (hx 0.60 > half the 0.65 m
            # spacing), shrinking to the calibrated reference geometry
            # (hx = stone_radius) at level 5. Without it, level-0 planks
            # have 0.15-0.25 m gaps from the first frame and the policy
            # settles into the walk-2-stones-then-stand stall optimum
            # (runs/r4_ab_plank2: 240-step episodes, return pinned at
            # ~454 for 2.7e8 frames). The LEVEL-5 geometry — the mastery
            # claim — is unchanged by the assist.
            r_eff = state.stone_radius + cfg.radius_extra * (
                1.0 - terr.level_scale(state.cur.assist)
            )
            hy = cfg.plank_hy
        else:
            raise ValueError(f"unknown support mode {cfg.support!r}")
        if cfg.actuation == "pd":
            # stable PD: target held over the control step, torque
            # re-evaluated each 240 Hz substep with implicit kp/kd
            target = engine.pd_target_from_action(model, action)
            phys, info = engine.step(
                model, state.phys, jnp.zeros_like(qj), state.terrain,
                r_eff, jnp.asarray(False), cfg.contact,
                pd_target=target, pd_power=state.robot_power,
                support_hy=hy,
            )
        else:
            tau = engine.torque_actuation(model, action, qj, qdj)
            tau = tau * state.robot_power  # set_robot_params power scaling
            phys, info = engine.step(
                model, state.phys, tau, state.terrain, r_eff,
                jnp.asarray(False), cfg.contact, support_hy=hy,
            )
        foot_xyz = _foot_xyz(model, phys.q)

        # ---- step-hit detection & terrain resampling -----------------
        # (mocca calc_feet_state: contact with the target stone advances
        # next_step_index; at the final stone the index stays put)
        ns = state.next_step_index
        hit = jnp.any((info.foot_stone == ns) & info.foot_contact)
        ns_new = jnp.where(hit, jnp.minimum(ns + 1, last), ns)
        # horizontal distance of the closest foot to the target stone
        # center, for the step bonus (mocca foot_dist_to_target)
        fd = foot_xyz[:, :2] - state.terrain[jnp.minimum(ns, last), :2]
        foot_dist = jnp.min(jnp.sqrt(jnp.sum(fd * fd, axis=1) + 1e-12))

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
            foot_xyz=foot_xyz,
            phase=jnp.where(
                cfg.clock_period > 0,
                (state.phase + 1.0 / max(cfg.clock_period, 1)) % 1.0,
                state.phase,
            ),
        )

        # ---- reward (mocca calc_base_reward + calc_step_reward) -------
        # progress vs the OLD walk target, then re-anchor the potential to
        # the new one (mocca: calc_potential() re-runs on index advance)
        old_tgt = self._walk_target(state.terrain, ns)
        d_old = old_tgt[:2] - phys.q[0:2]
        dist_old = jnp.sqrt(d_old[0] ** 2 + d_old[1] ** 2 + 1e-12)
        progress = (state.prev_dist - dist_old) / CONTROL_DT
        new_dist = self._target_dist(mid)

        height = phys.q[2] - jnp.min(foot_xyz[:, 2])
        tall = height > cfg.termination_height
        tall_bonus = jnp.where(tall, cfg.tall_bonus, -1.0)

        yaw, pitch, roll = qt.to_euler_zyx(phys.q[3:7])
        posture = (
            jnp.where((pitch < -0.2) | (pitch > 0.4), jnp.abs(pitch), 0.0)
            + jnp.where((roll < -0.4) | (roll > 0.4), jnp.abs(roll), 0.0)
        )

        a = jnp.clip(action, -1.0, 1.0)
        speeds = 0.1 * phys.qd[6:]
        electricity = cfg.electricity_cost * jnp.mean(jnp.abs(a * speeds[model.actuated_idx]))
        stall = cfg.stall_torque_cost * jnp.mean(a * a)
        at_limit = jnp.abs(_norm_angles(model, phys.q[7:])) > 0.99
        joints_pen = cfg.joints_at_limit_cost * jnp.sum(at_limit.astype(jnp.float32))

        # step bonus on the first contact frame, excluded once the NEW
        # index is the final stone (mocca calc_step_reward)
        step_bonus = jnp.where(
            hit & (ns_new != last),
            cfg.step_bonus * jnp.exp(-foot_dist / cfg.step_bonus_scale),
            0.0,
        )
        # standing at the final stone: +2 per control step within 0.15 m
        target_bonus = jnp.where(
            (ns_new == last) & (new_dist < 0.15), cfg.target_bonus, 0.0
        )

        reward = (
            progress + step_bonus + target_bonus + tall_bonus
            - electricity - stall - joints_pen - posture
        )

        # ---- termination ---------------------------------------------
        # per-env NaN firewall (SURVEY §5 failure-detection row; mocca
        # calc_env_state: non-finite robot state forces done) — the env
        # resets itself and the poisoned reward is squashed so it cannot
        # reach GAE/PPO.
        finite = (
            jnp.isfinite(phys.q).all()
            & jnp.isfinite(phys.qd).all()
            & jnp.isfinite(reward)
        )
        reward = jnp.where(finite, reward, 0.0)
        elapsed = state.elapsed + 1
        timeout = elapsed >= cfg.max_episode_steps
        last_hit = jnp.where(hit, elapsed, state.last_hit)
        if cfg.stall_timeout > 0:
            # exemption only for envs actually STANDING at the final stone
            # (mirrors the target_bonus condition) — exempting every env
            # whose *target* is the final stone let a policy park at the
            # second-to-last stone and farm the tall bonus to timeout
            # (round-4 advisor finding #1)
            at_goal = (ns_new == last) & (new_dist < 0.15)
            stalled = (elapsed - last_hit >= cfg.stall_timeout) & ~at_goal
        else:
            stalled = jnp.asarray(False)  # rule disabled (fidelity A/B)
        fall = ~tall | ~finite | stalled
        done = fall | timeout
        ep_return = state.ep_return + reward

        mid = mid._replace(
            elapsed=elapsed,
            prev_dist=new_dist,
            ep_return=ep_return,
            update_terrain=hit,
            last_hit=last_hit,
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
            timeout=timeout & ~fall,
            ep_return=jnp.where(done, ep_return, 0.0),
            ep_len=jnp.where(done, elapsed, 0).astype(jnp.int32),
            # "advanced to a new stone" (at the final stone, contact keeps
            # firing update_terrain like mocca, but doesn't count as a hit)
            hit=hit & (ns_new != ns),
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

    def update_curriculum(self, state: EnvState, level, assist=None) -> EnvState:
        """assist=None ties the support-assist to the level (the fixed
        curriculum's behavior); pass an explicit assist to keep the
        learnability ramp while installing a different sampling range
        (threshold uniform rounds, reference `train.py:273-274`)."""
        cur = state.cur._replace(
            level=jnp.asarray(level, jnp.float32),
            use_prob=jnp.asarray(False),
            assist=jnp.asarray(level if assist is None else assist, jnp.float32),
        )
        return state._replace(cur=cur)

    def update_assist(self, state: EnvState, assist) -> EnvState:
        """Set only the support-geometry assist level (grid-mode runs)."""
        cur = state.cur._replace(assist=jnp.asarray(assist, jnp.float32))
        return state._replace(cur=cur)

    def update_specialist(self, state: EnvState, k) -> EnvState:
        """Reference env-side `update_specialist(k)` (envs_utils.py:585-587):
        restrict stone sampling to difficulty band k — an annulus of the
        (yaw, pitch) grid (ALLSTEPS specialist curriculum)."""
        prob = terr.specialist_band_prob(k)
        cur = state.cur._replace(
            sample_prob=jnp.broadcast_to(prob, state.cur.sample_prob.shape),
            use_prob=jnp.broadcast_to(jnp.asarray(True), state.cur.use_prob.shape),
        )
        return state._replace(cur=cur)

    def update_sample_prob(self, state: EnvState, prob: jnp.ndarray) -> EnvState:
        prob = prob / (jnp.sum(prob) + 1e-12)
        cur = state.cur._replace(sample_prob=prob, use_prob=jnp.asarray(True))
        return state._replace(cur=cur)

    # ---- mirror metadata (reference `get_mirror_indices`) -------------
    def get_mirror_indices(self):
        """Six index lists: (neg_obs, right_obs, left_obs, neg_act,
        right_act, left_act) — reference `envs_utils.py:687-694`; layouts
        follow mocca_envs Walker3D.get_mirror_indices."""
        cfg = self.cfg
        nj = cfg.model.njoints
        if cfg.clock_period:
            # Cassie layout: 3 header + 3 v + 2 rp + 3 w + nj + nj + 2 + 2 clock
            mir = cassie_mod.MIRROR
            base = 11
            jpos = lambda j: base + j
            jvel = lambda j: base + nj + j
            contact0 = base + 2 * nj
            neg_obs = [1, 4, 6, 8, 10]  # sin(bearing), vy, roll, wx, wz
            neg_obs += [jpos(j) for j in mir["neg_joints"]]
            neg_obs += [jvel(j) for j in mir["neg_joints"]]
            tgt0 = contact0 + 2 + 2
            neg_obs += [tgt0 + 4 * k for k in range(cfg.lookahead)]       # sin*d
            neg_obs += [tgt0 + 4 * k + 3 for k in range(cfg.lookahead)]   # x_tilt
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
            amir = cassie_mod.MIRROR_ACTION
            neg_act = amir["neg_actions"]
            right_act = amir["right_actions"]
            left_act = amir["left_actions"]
        else:
            # Walker3D layout: [height, vx, vy, vz, roll, pitch] + angles
            # + speeds + contacts + (sin*d, cos*d, dz, x_tilt, y_tilt) x 2
            mir = walker_mod.MIRROR
            jpos = lambda j: 6 + j
            jvel = lambda j: 6 + nj + j
            contact0 = 6 + 2 * nj
            tgt0 = contact0 + 2
            neg_obs = [2, 4]  # vy, roll
            neg_obs += [jpos(j) for j in mir["neg_joints"]]
            neg_obs += [jvel(j) for j in mir["neg_joints"]]
            neg_obs += [tgt0 + 5 * k for k in range(cfg.lookahead)]       # sin*d
            neg_obs += [tgt0 + 5 * k + 3 for k in range(cfg.lookahead)]   # x_tilt
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


# The reference selects support geometry with a `plank_class` env kwarg
# (mocca bullet_objects class names, SURVEY.md §2.9); map the names onto
# our support modes. Half-extents are judgment calls documented in
# reports/CALIBRATION.md (the mocca_envs submodule is absent upstream).
PLANK_CLASSES = {
    "Pillar": dict(support="pillar"),
    "Plank": dict(support="plank", plank_hy=0.6),
    "LargePlank": dict(support="plank", plank_hy=1.5),
}


def _overrides(kw: dict) -> dict:
    kw = dict(kw)
    plank_class = kw.pop("plank_class", None)
    if plank_class is not None:
        kw.update(PLANK_CLASSES[plank_class])
    return kw


def walker3d_stepper(**kw) -> StepperEnv:
    return _make(StepperConfig(
        name="Walker3DStepperEnv-v0",
        model=walker_mod.walker3d(),
        actuation="torque",
        obs_dim=60,
        **_overrides(kw),
    ))


def mike_stepper(**kw) -> StepperEnv:
    return _make(StepperConfig(
        name="MikeStepperEnv-v0",
        model=walker_mod.mike(),
        actuation="torque",
        obs_dim=60,
        **_overrides(kw),
    ))


def cassie_stepper(**kw) -> StepperEnv:
    return _make(StepperConfig(
        name="CassieStepper-v1",
        model=cassie_mod.cassie(),
        actuation="pd",
        obs_dim=51,
        termination_height=0.5,
        clock_period=30,
        init_forward_speed=0.8,
        **_overrides(kw),
    ))
