"""Random-agent episode through the Gymnasium API
(capability parity: reference examples/run_gym.py)."""
import numpy as np
import gymnasium

from simglucose_tpu.envs import register_envs

register_envs()

env = gymnasium.make("simglucose-v0", patient_name="adolescent#002", seed=0)
obs, info = env.reset()
for t in range(100):
    action = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(action)
    print(f"t={t} CGM={obs[0]:7.2f} reward={reward:+.4f} BG={info['bg']:.1f}")
    if terminated or truncated:
        print("Episode finished after {} timesteps".format(t + 1))
        obs, info = env.reset()
