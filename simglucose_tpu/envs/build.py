"""Convenience builders wiring params tables into env configs/params.

The reference assembles ``T1DSimEnv(patient, sensor, pump, scenario)`` from
named hardware (reference: simulation/user_interface.py:364-372); these
helpers are the functional analog: resolve names -> packed parameter pytrees
+ a static :class:`EnvConfig`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from simglucose_tpu import params as tables
from simglucose_tpu.envs.functional import EnvConfig, EnvParams


def make_env(
    patient_names: Union[str, int, Sequence],
    sensor: str = "Dexcom",
    pump: str = "Insulet",
    dtype=np.float32,
    batch: bool = False,
    substeps: int = 1,
    method: str = "rk4",
    noise_seq: Optional[np.ndarray] = None,
    meal_seq: Optional[np.ndarray] = None,
    custom_times: Optional[np.ndarray] = None,
    custom_amounts: Optional[np.ndarray] = None,
    scenario_mode: Optional[str] = None,
    random_init_bg: bool = False,
) -> tuple[EnvConfig, EnvParams]:
    """Build (EnvConfig, EnvParams) for one patient or a batch.

    With ``batch=False`` and a single name, parameter leaves are scalar
    (single-env semantics, vmap-ready).  With ``batch=True`` leaves keep the
    leading [B] axis; sensor/pump params are broadcast to [B] so the whole
    EnvParams pytree vmaps along axis 0.

    ``method='rk4'`` (default) is the fast native integrator: vs the
    reference-grade rk45/substeps=4 configuration it differs by <2e-3 mg/dL
    max BG over a closed-loop day (tests/test_integrators.py) at 2/3 the
    stage count.  Verification configs pin ``method='rk45', substeps=4``.
    """
    patient = tables.load_patient_params(patient_names, dtype=dtype)
    B = patient.BW.shape[0]

    if scenario_mode is None:
        scenario_mode = "exogenous" if meal_seq is not None else "random"
    noise_mode = "exogenous" if noise_seq is not None else "native"

    cfg = EnvConfig(
        sample_time=tables.sensor_sample_time(sensor),
        substeps=substeps,
        method=method,
        noise_mode=noise_mode,
        scenario_mode=scenario_mode,
        random_init_bg=random_init_bg,
    )
    sensor_p = tables.load_sensor_params(sensor, dtype=dtype)
    pump_p = tables.load_pump_params(pump, dtype=dtype)

    def maybe_arr(x):
        return None if x is None else jnp.asarray(np.asarray(x, dtype=dtype))

    if batch:
        sensor_p = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,)), sensor_p)
        pump_p = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,)), pump_p)
        bcast = lambda x: (
            None
            if x is None
            else jnp.broadcast_to(maybe_arr(x), (B,) + np.shape(x))
        )
        env_params = EnvParams(
            patient=patient,
            sensor=sensor_p,
            pump=pump_p,
            noise_seq=bcast(noise_seq),
            meal_seq=bcast(meal_seq),
            custom_times=bcast(custom_times),
            custom_amounts=bcast(custom_amounts),
        )
    else:
        if B != 1:
            raise ValueError("batch=False requires a single patient name")
        patient = jax.tree.map(lambda a: a[0], patient)
        env_params = EnvParams(
            patient=patient,
            sensor=sensor_p,
            pump=pump_p,
            noise_seq=maybe_arr(noise_seq),
            meal_seq=maybe_arr(meal_seq),
            custom_times=(
                None
                if custom_times is None
                else jnp.asarray(np.asarray(custom_times), jnp.int32)
            ),
            custom_amounts=maybe_arr(custom_amounts),
        )
    return cfg, env_params


def cohort_names(n: int) -> list:
    """Cycle the 30-patient cohort out to ``n`` entries (batch builder for
    large-scale runs, e.g. 4096 patients)."""
    base = tables.patient_names()
    return [base[i % len(base)] for i in range(n)]
