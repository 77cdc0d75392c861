from steppingstone_tpu.envs.registry import make_env, ENV_IDS
