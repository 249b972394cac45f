"""Custom reward function plumbed into the gym env
(capability parity: reference examples/custom_reward_function.py)."""
import jax.numpy as jnp
import numpy as np

from simglucose_tpu.envs.gym_env import T1DSimGymEnv


def custom_reward(bg_hist):
    """Reference-style single-argument reward over the last-hour CGM
    window: +1 in range, -1 hyper, -2 hypo."""
    bg = bg_hist[-1]
    return jnp.where(bg > 180, -1.0, jnp.where(bg < 70, -2.0, 1.0))


env = T1DSimGymEnv(
    patient_name="adolescent#002", reward_fun=custom_reward, seed=0
)
obs, info = env.reset()
for t in range(30):
    obs, reward, terminated, truncated, info = env.step(np.asarray([0.01]))
    print(f"t={t} CGM={obs[0]:7.2f} reward={reward:+.1f}")
    if terminated:
        break
