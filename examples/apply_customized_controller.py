"""Write your own controller as a pure function
(capability parity: reference examples/apply_customized_controller.py).

A controller is (init_state, policy) where
    policy(ctrl_state, prev_step_result) -> (ctrl_state, CtrlAction)
and must be jax-traceable (it runs inside the compiled rollout).
"""
from datetime import datetime, timedelta

import jax.numpy as jnp

from simglucose_tpu.core.types import CtrlAction
from simglucose_tpu.sim import simulate


def make_my_controller(target=120.0, gain=5e-4):
    """Proportional-only controller with state tracking the last CGM."""

    def policy(last_cgm, result):
        cgm = result.observation.CGM
        basal = jnp.maximum(gain * (cgm - target), 0.0)
        return cgm, CtrlAction(basal=basal, bolus=jnp.zeros_like(basal))

    init_state = jnp.asarray(140.0, jnp.float32)
    return init_state, policy


df = simulate(
    sim_time=timedelta(hours=12),
    patient_names=["adolescent#001"],
    controller=make_my_controller(),
    start_time=datetime(2018, 1, 1, 6),
)
print(df.loc["adolescent#001"].BG.describe())
