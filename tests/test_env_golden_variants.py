"""Closed-loop golden parity across patients and sensor hardware.

Extends the canonical adolescent#001/Dexcom oracle to GuardianRT (5-min) and
Navigator (1-min) sensors — different sample_times change the mini-step scan
length, the reward window, and the noise lattice phase, so these exercise
genuinely different compiled programs (reference sensors:
params/sensor_params.csv:2-4).
"""
from datetime import datetime

import jax
import numpy as np
import pytest

from simglucose_tpu.compat.noise import reference_cgm_noise
from simglucose_tpu.compat.scenario import reference_meal_seq
from simglucose_tpu.controllers.functional import bb_controller, bb_params
from simglucose_tpu.envs.build import make_env
from simglucose_tpu.envs.rollout import rollout
from simglucose_tpu.params import (
    load_quest_params,
    sensor_record,
    sensor_sample_time,
)

from conftest import load_golden

CONFIGS = [
    ("adult#005", "GuardianRT", 2, 2, "closedloop_adult_005_GuardianRT.npz"),
    ("child#003", "Navigator", 3, 5, "closedloop_child_003_Navigator.npz"),
]


@pytest.mark.parametrize(
    "pname,sname,cgm_seed,scen_seed,fixture", CONFIGS,
    ids=[c[4].split(".")[0] for c in CONFIGS],
)
def test_closedloop_variant_golden(pname, sname, cgm_seed, scen_seed, fixture):
    g = load_golden(fixture)
    st = sensor_sample_time(sname)
    n_steps = 24 * 60 // st

    noise = reference_cgm_noise(sensor_record(sname), cgm_seed, n_steps + 2)
    meals = reference_meal_seq(
        scen_seed, datetime(2018, 1, 1, 0, 0, 0), n_steps * st + 1
    )
    cfg, params = make_env(
        pname,
        sensor=sname,
        dtype=np.float64,
        noise_seq=noise,
        meal_seq=meals,
        substeps=4,
        method="rk45",
    )
    quest = jax.tree.map(lambda a: a[0], load_quest_params(pname, dtype=np.float64))
    ctrl0, ctrl = bb_controller(bb_params(params.patient, quest), cfg.sample_time)
    _, reset_res, traj = jax.jit(
        lambda key: rollout(cfg, params, key, ctrl0, ctrl, n_steps)
    )(jax.random.PRNGKey(0))

    bg = np.concatenate([[float(reset_res.BG)], np.asarray(traj.BG)])
    cgm = np.concatenate([[float(reset_res.CGM)], np.asarray(traj.CGM)])
    assert len(bg) == len(g["BG"])
    np.testing.assert_allclose(bg, g["BG"], rtol=5e-7)
    np.testing.assert_allclose(cgm, g["CGM"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(traj.CHO), g["CHO"][:-1], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(traj.insulin), g["insulin"][:-1], rtol=1e-9
    )
    risk = np.concatenate([[float(reset_res.risk)], np.asarray(traj.risk)])
    np.testing.assert_allclose(risk, g["Risk"], rtol=1e-4, atol=1e-9)
