"""THE canonical correctness oracle: 2-day closed-loop golden trace.

Reproduces the reference's tests/test_sim_engine.py:88-113 config —
adolescent#001, Dexcom seed 1, RandomScenario seed 1, BBController, start
2018-01-01 00:00, 2 days — against the golden trace regenerated from the
reference (bitwise equal to its committed tests/sim_results.csv).

Tolerance contract (documented in SURVEY §7 "hard parts"):
  * RNG-driven streams (CGM noise pops, meal minutes) are bit-exact via the
    MT19937 compat pregeneration;
  * pure arithmetic (CHO/insulin averages, pump quantization) matches to
    1 ulp (XLA may emit reciprocal-multiplies for constant divisions);
  * ODE-integrated quantities (BG, and CGM = BG + exact noise) match the
    adaptive-dopri5 reference to <=5e-8 relative at substeps=4 in float64.
"""
import functools
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simglucose_tpu.compat.noise import reference_cgm_noise
from simglucose_tpu.compat.scenario import reference_meal_seq
from simglucose_tpu.controllers.functional import bb_controller, bb_params
from simglucose_tpu.envs.build import make_env
from simglucose_tpu.envs.rollout import rollout
from simglucose_tpu.params import load_quest_params, sensor_record

from conftest import load_golden

N_STEPS = 2 * 24 * 60 // 3  # 960 env steps (Dexcom 3-min)


@functools.lru_cache(maxsize=1)
def _run_golden_config():
    noise = reference_cgm_noise(sensor_record("Dexcom"), 1, N_STEPS + 2)
    meals = reference_meal_seq(1, datetime(2018, 1, 1, 0, 0, 0), N_STEPS * 3 + 1)
    cfg, params = make_env(
        "adolescent#001",
        dtype=np.float64,
        noise_seq=noise,
        meal_seq=meals,
        substeps=4,
        method="rk45",
    )
    quest = jax.tree.map(
        lambda a: a[0], load_quest_params("adolescent#001", dtype=np.float64)
    )
    bb = bb_params(params.patient, quest)
    ctrl0, ctrl = bb_controller(bb, cfg.sample_time)
    _, reset_res, traj = jax.jit(
        lambda key: rollout(cfg, params, key, ctrl0, ctrl, N_STEPS)
    )(jax.random.PRNGKey(0))
    return reset_res, traj


def test_closedloop_golden_trace():
    g = load_golden("closedloop_golden.npz")
    reset_res, traj = _run_golden_config()

    bg = np.concatenate([[float(reset_res.BG)], np.asarray(traj.BG)])
    cgm = np.concatenate([[float(reset_res.CGM)], np.asarray(traj.CGM)])
    assert len(bg) == len(g["BG"]) == 961

    # row 0 is the reset entry: BG is the patient's steady state and CGM is
    # the first exact noise pop (BASELINE.md: 149.02 / 165.7939493687905)
    assert bg[0] == pytest.approx(149.02, abs=1e-9)
    assert cgm[0] == pytest.approx(165.7939493687905, abs=1e-9)

    np.testing.assert_allclose(bg, g["BG"], rtol=5e-8)
    np.testing.assert_allclose(cgm, g["CGM"], atol=1e-5)
    # CHO/insulin histories have one entry per step (the golden arrays carry
    # a trailing NaN from the reference's ragged DataFrame, env.py:169-180)
    np.testing.assert_allclose(np.asarray(traj.CHO), g["CHO"][:-1], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(traj.insulin), g["insulin"][:-1], rtol=1e-12
    )
    # risk indices (computed from BG)
    lbgi = np.concatenate([[float(reset_res.LBGI)], np.asarray(traj.LBGI)])
    hbgi = np.concatenate([[float(reset_res.HBGI)], np.asarray(traj.HBGI)])
    risk = np.concatenate([[float(reset_res.risk)], np.asarray(traj.risk)])
    np.testing.assert_allclose(lbgi, g["LBGI"], rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(hbgi, g["HBGI"], rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(risk, g["Risk"], rtol=1e-5, atol=1e-10)


def test_closedloop_never_terminated():
    """The golden config keeps BG in (70, 350) throughout (the reference run
    completed 2 full days)."""
    _, traj = _run_golden_config()
    assert not np.asarray(traj.done).any()
