"""Runtime tests: config CLI, logger schema, torch checkpoint import,
checkpoint round-trip, end-to-end tiny training run."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from steppingstone_tpu.runtime.config import TrainConfig, init_experiment, parse_cli
from steppingstone_tpu.runtime.loggers import ConsoleCSVLogger
from steppingstone_tpu.runtime.schedules import exponential_decay, linear_decay

REF_MODELS = "/root/reference/playground/models"


def test_config_cli_overrides():
    cfg = parse_cli([
        "with", "env_name=Walker3DStepperEnv-v0", "num_processes=8",
        "episode_steps=256", "use_curriculum=True", "lr=0.001",
        "num_frames=512",
    ])
    assert cfg.env_name == "Walker3DStepperEnv-v0"
    assert cfg.num_processes == 8
    assert cfg.use_curriculum is True
    assert cfg.lr == 0.001
    assert cfg.num_steps == 32          # derived (episode_steps / processes)
    assert cfg.num_updates == 2


def test_config_rejects_unknown_key():
    with pytest.raises(SystemExit):
        parse_cli(["frobnicate=1"])


def test_config_divisibility_validation():
    with pytest.raises(AssertionError):
        parse_cli(["episode_steps=100", "num_processes=7"])


def test_init_experiment_writes_metadata(tmp_path):
    cfg = TrainConfig(experiment_dir=str(tmp_path / "exp"), replicate_num=2,
                      num_processes=10, episode_steps=100, num_frames=1000)
    base_seed = cfg.seed
    init_experiment(cfg)
    # replicate seed offset (reference sacred_utils.py:34)
    assert cfg.seed == base_seed + 10
    cfgj = json.load(open(tmp_path / "exp" / "configs.json"))
    assert cfgj["replicate_num"] == 2
    runj = json.load(open(tmp_path / "exp" / "run.json"))
    assert "host" in runj


def test_logger_schema_matches_reference(tmp_path):
    lg = ConsoleCSVLogger(str(tmp_path), console_log_interval=1000)
    lg.log_epoch({
        "iter": 1, "total_num_steps": 100, "fps": 10,
        "entropy": 0.1, "value_loss": 1.0, "action_loss": 0.2,
        "stats": {"rew": [1.0, 2.0, 3.0]},
        "test_stats": {"rew": [4.0]},
    })
    header = open(tmp_path / "progress.csv").readline().strip().split(",")
    # exact reference schema (common/csv_utils.py + train.py:567-578)
    assert header == [
        "iter", "total_num_steps", "fps", "entropy", "value_loss",
        "action_loss", "mean_rew", "median_rew", "min_rew", "max_rew",
        "test_mean_rew", "test_median_rew", "test_min_rew", "test_max_rew",
    ]


def test_schedules_match_reference():
    # exponential_decay floors at final_value (misc_utils.py:26-27)
    assert exponential_decay(0, 0.99, 3e-4, 3e-5) == 3e-4
    assert exponential_decay(10_000, 0.99, 3e-4, 3e-5) == 3e-5
    assert linear_decay(50, 100, 1.0, 0.0) == pytest.approx(0.5)


@pytest.mark.skipif(not os.path.isdir(REF_MODELS), reason="no reference checkpoints")
def test_torch_import_matches_reference_forward():
    """Imported weights must reproduce the reference actor's math:
    softsign x3 + relu x2 + tanh applied to the raw state dict."""
    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.runtime.torch_import import (
        _load_torch_module_state, load_reference_checkpoint,
    )

    path = os.path.join(REF_MODELS, "mocca_envs:Walker3DStepperEnv-v0_latest.pt")
    sd = _load_torch_module_state(path)
    params, n = load_reference_checkpoint(path, 21)
    net = ActorCritic(action_dim=21, num_ensembles=n)

    rng = np.random.RandomState(0)
    x = rng.randn(3, 60).astype(np.float32)

    # numpy reimplementation of the reference forward (controller.py:254-261)
    def ref_actor(x):
        h = x
        for i, layer in enumerate(["fc1", "fc2", "fc3", "fc4", "fc5"]):
            h = h @ sd[f"actor.{layer}.weight"].T + sd[f"actor.{layer}.bias"]
            h = h / (1 + np.abs(h)) if i < 3 else np.maximum(h, 0)
        h = h @ sd["actor.out.weight"].T + sd["actor.out.bias"]
        return np.tanh(h)

    got = np.asarray(net.apply(params, jnp.asarray(x), method="action_mean"))
    assert np.allclose(got, ref_actor(x), atol=1e-4)

    def ref_critic(x):
        h = x
        for sid in [0, 2, 4, 6]:
            h = np.maximum(h @ sd[f"critic.{sid}.weight"].T + sd[f"critic.{sid}.bias"], 0)
        return h @ sd["critic.8.weight"].T + sd["critic.8.bias"]

    got_v = np.asarray(net.apply(params, jnp.asarray(x), method="value"))
    assert np.allclose(got_v, ref_critic(x), atol=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    from steppingstone_tpu.runtime.checkpoint import CheckpointManager, host_pytree

    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": 7}
    mgr.save("latest", host_pytree(state))
    assert mgr.exists("latest")
    back = mgr.restore("latest", target=host_pytree(state))
    assert np.allclose(back["params"]["w"], state["params"]["w"])
    assert int(back["step"]) == 7


def test_tiny_training_run(tmp_path):
    """2-update end-to-end training on 4 envs: progress.csv written,
    checkpoints saved, losses finite, fixed curriculum installed."""
    from steppingstone_tpu.runtime.train import Trainer

    # 8 envs so the auto-mesh over the 8 virtual CPU devices divides evenly
    # (this also exercises the sharded multi-chip train path every session)
    cfg = parse_cli([
        "env_name=Walker3DStepperEnv-v0", "num_processes=8",
        "episode_steps=128", "mini_batch_size=64", "num_frames=1024",
        "num_tests=0", "use_curriculum=True", "seed=1",
        f"experiment_dir={tmp_path}/run",
    ])
    Trainer(cfg).train()
    # logging starts once >=2 episodes completed (reference
    # `len(episode_rewards) > 1`, train.py:564); 8 updates x 16 steps with
    # an untrained policy is plenty for several falls
    csv = open(tmp_path / "run" / "progress.csv").read().strip().splitlines()
    assert len(csv) >= 2  # header + >=1 row
    assert os.path.isdir(tmp_path / "run" / "checkpoints" / "latest")


def _csv_rows(path):
    rows = open(path).read().strip().splitlines()
    header = rows[0].split(",")
    out = {}
    for r in rows[1:]:
        vals = dict(zip(header, r.split(",")))
        out[int(vals["iter"])] = vals
    return header, out


def test_resume_is_bitwise_total(tmp_path):
    """Full-resume acceptance (SURVEY §5 'full bitwise resume'): train 2
    updates + resume for 2 more == one unbroken 4-update run, identical
    progress.csv metrics (all columns except wall-clock fps)."""
    from steppingstone_tpu.runtime.train import Trainer

    base = [
        "env_name=Walker3DStepperEnv-v0", "num_processes=8",
        "episode_steps=128", "mini_batch_size=64", "num_tests=0",
        "use_curriculum=True", "seed=3", "checkpoint_interval=1",
    ]
    # unbroken 4-update run
    cfg_a = parse_cli(base + ["num_frames=512", f"experiment_dir={tmp_path}/a"])
    Trainer(cfg_a).train()
    # 2 updates, then resume to 4
    cfg_b1 = parse_cli(base + ["num_frames=256", f"experiment_dir={tmp_path}/b"])
    Trainer(cfg_b1).train()
    cfg_b2 = parse_cli(
        base + ["num_frames=512", "resume=True", f"experiment_dir={tmp_path}/b"]
    )
    Trainer(cfg_b2).train()

    header, rows_a = _csv_rows(tmp_path / "a" / "progress.csv")
    _, rows_b = _csv_rows(tmp_path / "b" / "progress.csv")
    assert set(rows_a) == set(rows_b)
    skip = {"fps"}
    for it in rows_a:
        for col in header:
            if col in skip:
                continue
            va, vb = float(rows_a[it][col]), float(rows_b[it][col])
            assert va == pytest.approx(vb, rel=1e-5, abs=1e-6), (
                f"iter {it} col {col}: unbroken={va} resumed={vb}"
            )


def test_distributed_two_process(tmp_path):
    """Multi-host wiring (reference scale-out analog:
    `scripts/cedar_run_playground_train.sh:24-45`): the same tiny training
    run executes under 2 coordinator-connected host processes with 4
    virtual CPU devices each, sharded over the global 8-device mesh."""
    import subprocess
    import sys

    script = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["STEPPINGSTONE_NO_COMPILE_CACHE"] = "1"
from steppingstone_tpu.runtime.train import main
main([
    "env_name=Walker3DStepperEnv-v0", "num_processes=8",
    "episode_steps=128", "mini_batch_size=64", "num_frames=" + sys.argv[2],
    "num_tests=0", "use_curriculum=True", "seed=3",
    "checkpoint_interval=1", "experiment_dir=" + sys.argv[1],
] + sys.argv[3:])
"""
    env_base = {
        k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)
    }

    def launch(frames, extra=()):
        procs = []
        for rank in range(2):
            env = dict(
                env_base,
                JAX_COORDINATOR_ADDRESS="localhost:12357",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(rank),
            )
            procs.append(subprocess.Popen(
                [sys.executable, "-c", script, str(tmp_path / "dist"),
                 str(frames), *extra],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ))
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
        return outs

    launch(256)
    assert os.path.exists(tmp_path / "dist" / "progress.csv")
    assert os.path.isdir(tmp_path / "dist" / "checkpoints" / "latest")
    # a resumed 2-process run continues the checkpointed one
    outs = launch(512, ("resume=True",))
    assert any("resumed from update 2" in o for o in outs), outs[0][-2000:]


def test_logstd_floor():
    """Exploration floor (late-training collapse guard): logstd consumed by
    the policy/losses is clamped at LOGSTD_MIN even if the raw param sinks
    below it."""
    from steppingstone_tpu.agents.networks import (
        LOGSTD_MIN, ActorCritic, clamped_logstd,
    )
    from steppingstone_tpu.agents.rollout import policy_action

    net = ActorCritic(action_dim=4)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    params["params"]["logstd"] = jnp.full((4,), -10.0)
    assert np.allclose(clamped_logstd(params), LOGSTD_MIN)
    # stochastic actions spread at exp(LOGSTD_MIN), not exp(-10)
    obs = jnp.zeros((512, 6))
    a, _ = policy_action(net.apply, params, obs, jax.random.PRNGKey(1), False)
    mean = net.apply(params, obs, method="action_mean")
    spread = np.asarray(a - mean).std()
    assert 0.7 * np.exp(LOGSTD_MIN) < spread < 1.3 * np.exp(LOGSTD_MIN)


def test_logger_blanks_stale_test_columns(tmp_path):
    """Between test intervals the test_* columns are blank, not repeats."""
    lg = ConsoleCSVLogger(str(tmp_path), console_log_interval=1000)
    base = {"iter": 1, "total_num_steps": 1, "fps": 1, "entropy": 0.0,
            "value_loss": 0.0, "action_loss": 0.0,
            "stats": {"rew": np.array([1.0, 2.0])}}
    lg.log_epoch({**base, "test_stats": {"rew": np.array([3.0])}})
    lg.log_epoch({**base, "iter": 2, "test_stats": {"rew": None}})
    lg.close()
    rows = open(tmp_path / "progress.csv").read().strip().splitlines()
    header = rows[0].split(",")
    r2 = dict(zip(header, rows[2].split(",")))
    assert r2["test_mean_rew"] == "" and r2["test_max_rew"] == ""
    r1 = dict(zip(header, rows[1].split(",")))
    assert float(r1["test_mean_rew"]) == 3.0


def test_logger_truncates_unless_resuming(tmp_path):
    """A fresh (non-resume) run pointed at an existing dir must not append
    under the stale header."""
    base = {"iter": 1, "total_num_steps": 1, "fps": 1, "entropy": 0.0,
            "value_loss": 0.0, "action_loss": 0.0,
            "stats": {"rew": np.array([1.0])},
            "test_stats": {"rew": np.array([1.0])}}
    lg = ConsoleCSVLogger(str(tmp_path), console_log_interval=1000)
    lg.log_epoch(dict(base))
    lg.log_epoch({**base, "iter": 2})
    lg.close()
    # fresh run: truncates
    lg = ConsoleCSVLogger(str(tmp_path), console_log_interval=1000)
    lg.log_epoch(dict(base))
    lg.close()
    rows = open(tmp_path / "progress.csv").read().strip().splitlines()
    assert len(rows) == 2  # header + 1 row
    # resumed run: appends
    lg = ConsoleCSVLogger(str(tmp_path), console_log_interval=1000, resume=True)
    lg.log_epoch({**base, "iter": 2})
    lg.close()
    rows = open(tmp_path / "progress.csv").read().strip().splitlines()
    assert len(rows) == 3


def test_resume_from_legacy_params_only_snapshot(tmp_path):
    """A 'latest' checkpoint in the old params-only layout must degrade to
    a params/opt/counters resume instead of failing (snapshot layouts have
    grown across rounds)."""
    from steppingstone_tpu.runtime.checkpoint import CheckpointManager, host_pytree
    from steppingstone_tpu.runtime.train import Trainer

    args = [
        "env_name=Walker3DStepperEnv-v0", "num_processes=8",
        "episode_steps=128", "mini_batch_size=64", "num_frames=256",
        "num_tests=0", "seed=5",
    ]
    cfg = parse_cli(args + [f"experiment_dir={tmp_path}/run"])
    tr = Trainer(cfg)
    params = tr.init_params(jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "run" / "checkpoints"))
    mgr.save("latest", host_pytree({
        "params": params, "opt_state": tr.tx.init(params),
        "update": 1, "frames": 128, "max_ep_reward": 3.5,
    }))
    cfg2 = parse_cli(
        [a for a in args if not a.startswith("num_frames")]
        + ["num_frames=768", "resume=True", f"experiment_dir={tmp_path}/run"]
    )
    Trainer(cfg2).train()  # must not raise
    csv = open(tmp_path / "run" / "progress.csv").read().strip().splitlines()
    assert len(csv) >= 2  # header + >=1 row logged after the resume
