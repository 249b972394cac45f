"""Integrator accuracy contract: the fast native rk4 path must stay within
clinical tolerance of the reference-grade rk45/substeps=4 configuration over
a full closed-loop day (this is what licenses rk4 as the make_env default)."""
import jax
import numpy as np

from simglucose_tpu.controllers.functional import bb_controller, bb_params
from simglucose_tpu.envs.build import make_env
from simglucose_tpu.envs.rollout import rollout
from simglucose_tpu.params import load_quest_params


def _day_bg(method, substeps):
    cfg, params = make_env(
        "adolescent#001",
        dtype=np.float64,
        method=method,
        substeps=substeps,
        scenario_mode="random",
    )
    quest = jax.tree.map(
        lambda a: a[0], load_quest_params("adolescent#001", dtype=np.float64)
    )
    ctrl0, ctrl = bb_controller(bb_params(params.patient, quest), cfg.sample_time)
    _, _, traj = jax.jit(
        lambda k: rollout(cfg, params, k, ctrl0, ctrl, 480)
    )(jax.random.PRNGKey(7))
    return np.asarray(traj.BG)


def test_rk4_within_clinical_tolerance_of_rk45():
    ref = _day_bg("rk45", 4)
    fast = _day_bg("rk4", 1)
    assert np.abs(fast - ref).max() < 0.01  # mg/dL, measured ~1.7e-3
    mid = _day_bg("rk4", 2)
    assert np.abs(mid - ref).max() < 1e-3
