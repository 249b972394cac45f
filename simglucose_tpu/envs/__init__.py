"""Environment layer: functional core env, rollout engines, Gym adapters."""
from simglucose_tpu.envs.build import cohort_names, make_env
from simglucose_tpu.envs.functional import (
    EnvConfig,
    EnvParams,
    env_reset,
    env_step,
    rewards_from_cgm,
    wrap_reward_fn,
)
from simglucose_tpu.envs.rllab_compat import Step, step_result_to_rllab
from simglucose_tpu.envs.rollout import (
    autoreset_step,
    batch_reset,
    broadcast_ctrl_state,
    make_batch_rollout_fn,
    rollout,
    rollout_batch,
)

__all__ = [
    "EnvConfig",
    "EnvParams",
    "env_reset",
    "env_step",
    "rewards_from_cgm",
    "wrap_reward_fn",
    "make_env",
    "cohort_names",
    "rollout",
    "rollout_batch",
    "autoreset_step",
    "batch_reset",
    "broadcast_ctrl_state",
    "make_batch_rollout_fn",
    "Step",
    "step_result_to_rllab",
    "T1DSimGymEnv",
    "T1DSimVectorEnv",
    "register_envs",
]


def __getattr__(name):
    # Gym adapters import gymnasium lazily so the core library stays
    # importable without it.
    if name in ("T1DSimGymEnv", "T1DSimVectorEnv", "register_envs"):
        from simglucose_tpu.envs import gym_env

        return getattr(gym_env, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
