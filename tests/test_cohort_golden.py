"""End-to-end cohort golden parity through the user-facing engine.

The reference's strongest cohort oracle is a 30-patient batch_sim +
report() run (reference: simulation/user_interface.py:364-385, frame
equality contract of tests/test_sim_engine.py:24-113, published stats of
examples/results/2017-12-31_17-46-32/performance_stats.csv).  This test
drives OUR user-facing entry — ``simulate(compat_mode=True)`` down through
make_env / rollout_batch / env_step / cohort_frame — for the identical
config (30 patients x 24 h, BBController, Dexcom cgm_seed=1, RandomScenario
seed=1, start 2018-01-01 00:00) and asserts frame-level parity of every
per-patient trace plus the report CSVs against goldens generated from the
reference itself (tools/gen_golden.py gen_cohort).

Tolerance contract:
  * RNG streams (noise pops, meal minutes) bit-exact via MT19937 compat;
  * CHO (announced meals) to 1e-12 relative;
  * ODE-integrated BG to <=1e-5 relative.  The floor here is the
    reference's OWN integration noise: scipy dopri5 runs at rtol=1e-6
    default, and raising our substeps 4 -> 8 moves the residual
    (3.8e-7 -> 6.0e-7 on adolescent#002) instead of shrinking it — the
    disagreement is the adaptive integrator's step-size choices, not our
    truncation.  On a few cohort members (e.g. adolescent#005) that
    integrator noise pushes a BB bolus command across a pump-quantization
    rounding boundary, flipping insulin by exactly ONE pump increment
    (0.05/6000 U/min) for one step and lifting the downstream BG residual
    to a few 1e-6 relative.  (The adolescent#001 2-day oracle in
    test_env_golden.py happens to track at 5e-8.)
  * insulin: 1e-12 relative OR one pump increment absolute (the boundary
    flips above);
  * CGM = BG + bit-exact noise: atol 1e-3 mg/dL (the BG residual);
  * report stats: time-in-range counts exact (no zone-boundary sample sits
    within 1e-3 mg/dL of a threshold); LBGI/HBGI to atol 1e-4 — they square
    a near-zero hourly-mean fBG, so relative error is unbounded by
    construction while absolute error stays at the 1e-5 level.
"""
import functools
import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from conftest import GOLDEN

from simglucose_tpu.sim.engine import simulate


@functools.lru_cache(maxsize=1)
def _run_cohort():
    df = simulate(
        sim_time=timedelta(days=1),
        scenario_seed=1,
        cgm_seed=1,
        start_time=datetime(2018, 1, 1, 0, 0, 0),
        compat_mode=True,
    )
    return df


def _golden():
    path = os.path.join(GOLDEN, "cohort_golden.npz")
    if not os.path.exists(path):
        pytest.skip("cohort golden not generated (tools/gen_golden.py cohort)")
    return np.load(path)


def test_cohort_traces_match_reference_batch_sim():
    g = _golden()
    df = _run_cohort()
    names = sorted({k.split("/")[0] for k in g.files})
    assert len(names) == 30
    for name in names:
        sub = df.loc[name]
        assert len(sub) == len(g[f"{name}/BG"]) == 481
        np.testing.assert_allclose(
            sub.BG.to_numpy(), g[f"{name}/BG"], rtol=1e-5,
            err_msg=f"{name}:BG",
        )
        np.testing.assert_allclose(
            sub.CGM.to_numpy(), g[f"{name}/CGM"], atol=1e-3,
            err_msg=f"{name}:CGM",
        )
        # reference CHO/insulin histories are step-aligned with a trailing
        # NaN (ragged DataFrame, env.py:169-180); ours lead with the reset 0
        np.testing.assert_allclose(
            sub.CHO.to_numpy()[1:], g[f"{name}/CHO"][:-1], rtol=1e-12,
            err_msg=f"{name}:CHO",
        )
        # one pump increment of slack for quantization-boundary flips
        np.testing.assert_allclose(
            sub.insulin.to_numpy()[1:], g[f"{name}/insulin"][:-1],
            rtol=1e-12, atol=0.05 / 6000 * 1.01,
            err_msg=f"{name}:insulin",
        )
        # risk = 10*fBG^2 with fBG crossing 0 near BG=112.5 — relative error
        # is unbounded there; absolute error stays at the 1e-4 level
        np.testing.assert_allclose(
            sub.Risk.to_numpy(), g[f"{name}/Risk"], rtol=1e-4, atol=1e-3,
            err_msg=f"{name}:Risk",
        )


def test_cohort_report_stats_match_reference(tmp_path):
    """Our report() on our simulate() frame must reproduce the reference
    report()'s performance_stats / risk_trace / CVGA_stats CSVs."""
    ref_stats_path = os.path.join(GOLDEN, "cohort_performance_stats.csv")
    if not os.path.exists(ref_stats_path):
        pytest.skip("cohort report goldens not generated")
    _golden()  # skip if traces missing too
    df = _run_cohort()

    from simglucose_tpu.analysis.report import report

    results, ri_per_hour, zone_stats, figs, axes = report(
        df, save_path=str(tmp_path)
    )

    ref_stats = pd.read_csv(ref_stats_path, index_col=0)
    ours_stats = pd.read_csv(tmp_path / "performance_stats.csv", index_col=0)
    assert list(ours_stats.index) == list(ref_stats.index)
    for col in ref_stats.columns:
        # time-in-range counts are exact; LBGI/HBGI square a near-zero
        # hourly-mean fBG (unbounded relative error; see module docstring)
        tol = (
            dict(rtol=0, atol=1e-9)
            if "BG" in col and "GI" not in col
            else dict(rtol=1e-3, atol=1e-4)
        )
        np.testing.assert_allclose(
            ours_stats[col].to_numpy(),
            ref_stats[col].to_numpy(),
            err_msg=f"performance_stats:{col}",
            **tol,
        )

    ref_risk = pd.read_csv(
        os.path.join(GOLDEN, "cohort_risk_trace.csv"), index_col=[0, 1]
    )
    ours_risk = pd.read_csv(tmp_path / "risk_trace.csv", index_col=[0, 1])
    np.testing.assert_allclose(
        ours_risk.to_numpy(), ref_risk.to_numpy(), rtol=1e-3, atol=1e-4
    )

    ref_cvga = pd.read_csv(
        os.path.join(GOLDEN, "cohort_CVGA_stats.csv"), index_col=0
    )
    ours_cvga = pd.read_csv(tmp_path / "CVGA_stats.csv", index_col=0)
    for z in ("A", "B", "C", "D", "E"):
        np.testing.assert_allclose(
            ours_cvga[z].to_numpy(), ref_cvga[z].to_numpy(), atol=1e-9,
            err_msg=f"CVGA:{z}",
        )

    # and the published 2017 sanity anchor: adolescent#001 TIR ~ high-80s %
    # (examples/results/2017-12-31_17-46-32/performance_stats.csv:1-2 shows
    # 88.98 % for its own seed; ours uses different seeds so only the frame
    # <-> report pipeline parity above is exact)
    assert 50.0 < float(ours_stats.loc["adolescent#001", "70<=BG<=180"]) <= 100.0


def test_cohort_never_nan():
    df = _run_cohort()
    assert np.isfinite(df.BG.to_numpy()).all()
    assert np.isfinite(df.CGM.to_numpy()).all()
