"""Env registry: reference env IDs -> TPU-native env constructors.

Mirrors the gym-registered IDs of the reference (`README.md:27-32`,
`train.py:37`): `mocca_envs:<Name>` prefixes are accepted and stripped.
"""

from __future__ import annotations

from steppingstone_tpu.envs.stepper import (
    StepperEnv,
    cassie_stepper,
    mike_stepper,
    walker3d_stepper,
)

_CONSTRUCTORS = {
    "Walker3DStepperEnv-v0": walker3d_stepper,
    "MikeStepperEnv-v0": mike_stepper,
    "CassieStepper-v1": cassie_stepper,
    # historical alias (reference `enjoy.py:411`)
    "Walker3DMocapStepperEnv-v0": walker3d_stepper,
}

ENV_IDS = tuple(_CONSTRUCTORS)


def make_env(env_id: str, **kwargs) -> StepperEnv:
    """kwargs are env-construction overrides, e.g. `plank_class="Plank"`
    (the reference's non-robot env kwarg, see stepper.PLANK_CLASSES) or any
    StepperConfig field."""
    name = env_id.split(":", 1)[-1]
    if name not in _CONSTRUCTORS:
        raise KeyError(f"unknown env id {env_id!r}; known: {ENV_IDS}")
    return _CONSTRUCTORS[name](**kwargs)
