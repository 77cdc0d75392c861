from steppingstone_tpu.agents.networks import ActorCritic
from steppingstone_tpu.agents.ppo import PPOConfig, ppo_update
