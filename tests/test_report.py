"""Analysis/report layer tests (reference: analysis/report.py behaviors)."""
import numpy as np
import pandas as pd
import pytest

from simglucose_tpu.analysis.report import (
    cohort_frame,
    cvga_points,
    cvga_zones,
    hourly_risk,
    report,
    time_in_range_stats,
    trajectory_frame,
)


def test_time_in_range_stats():
    bg = np.array(
        [[100.0, 200.0], [150.0, 260.0], [60.0, 300.0], [45.0, 100.0]]
    )  # [T=4, B=2]
    s = time_in_range_stats(bg)
    np.testing.assert_allclose(s["70<=BG<=180"], [50.0, 25.0])
    np.testing.assert_allclose(s["BG>180"], [0.0, 75.0])
    np.testing.assert_allclose(s["BG<70"], [50.0, 0.0])
    np.testing.assert_allclose(s["BG>250"], [0.0, 50.0])
    np.testing.assert_allclose(s["BG<50"], [25.0, 0.0])


def test_hourly_risk_matches_reference_method():
    """Reference chunks 60 samples, means fBG first, then squares
    (analysis/report.py:95-110)."""
    rng = np.random.RandomState(0)
    bg = rng.uniform(60, 280, size=(120, 3))
    lbgi, hbgi, ri = hourly_risk(bg)
    assert lbgi.shape == (2, 3)
    # reproduce reference formula directly for chunk 0, patient 0
    seg = bg[:60, 0]
    f = np.mean(1.509 * (np.log(seg[seg > 0]) ** 1.084 - 5.381))
    expected = 10 * (f * (f < 0)) ** 2, 10 * (f * (f > 0)) ** 2
    np.testing.assert_allclose(lbgi[0, 0], expected[0])
    np.testing.assert_allclose(hbgi[0, 0], expected[1])
    np.testing.assert_allclose(ri, lbgi + hbgi)


def test_cvga_zones():
    # patient A: tight control (A zone); patient B: hypo+hyper (E zone)
    bg_min = np.array([95.0, 60.0])
    bg_max = np.array([150.0, 320.0])
    z = cvga_zones(bg_min, bg_max)
    assert z["A"] == 0.5
    assert z["E"] == 0.5
    assert abs(sum(z.values()) - 1.0) < 1e-9 or sum(z.values()) <= 1.0


def test_cvga_points_clamped():
    bg = np.concatenate(
        [np.full((50, 1), 30.0), np.full((50, 1), 500.0)], axis=0
    )
    mn, mx = cvga_points(bg)
    assert mn[0] >= 50.0 and mx[0] <= 400.0


def _fake_traj(T=480, B=2, seed=0):
    from simglucose_tpu.core.types import Observation, StepResult

    rng = np.random.RandomState(seed)
    mk = lambda lo, hi: rng.uniform(lo, hi, size=(T, B))
    res = StepResult(
        observation=Observation(CGM=rng.uniform(80, 200, size=(B,))),
        reward=np.zeros(B),
        done=np.zeros(B, bool),
        CHO=np.zeros(B),
        insulin=np.full(B, 0.01),
        BG=rng.uniform(80, 200, size=(B,)),
        CGM=rng.uniform(80, 200, size=(B,)),
        LBGI=np.zeros(B),
        HBGI=np.zeros(B),
        risk=np.zeros(B),
    )
    traj = StepResult(
        observation=Observation(CGM=mk(80, 200)),
        reward=np.zeros((T, B)),
        done=np.zeros((T, B), bool),
        CHO=np.abs(rng.normal(0, 2, size=(T, B))),
        insulin=np.full((T, B), 0.01),
        BG=mk(80, 200),
        CGM=mk(80, 200),
        LBGI=np.zeros((T, B)),
        HBGI=mk(0, 3),
        risk=mk(0, 3),
    )
    return res, traj


def test_trajectory_and_cohort_frame():
    from datetime import datetime

    res, traj = _fake_traj()
    df = cohort_frame(
        res, traj, ["adolescent#001", "adult#001"], datetime(2018, 1, 1), 3
    )
    assert df.index.nlevels == 2
    assert len(df.loc["adolescent#001"]) == 481
    assert list(df.columns) == [
        "BG",
        "CGM",
        "CHO",
        "insulin",
        "LBGI",
        "HBGI",
        "Risk",
    ]


def test_report_end_to_end(tmp_path):
    from datetime import datetime

    import matplotlib

    matplotlib.use("Agg")
    res, traj = _fake_traj()
    df = cohort_frame(
        res, traj, ["adolescent#001", "adult#001"], datetime(2018, 1, 1), 3
    )
    results, ri_per_hour, zone_stats, figs, axes = report(
        df, save_path=str(tmp_path)
    )
    assert set(results.columns) == {
        "70<=BG<=180",
        "BG>180",
        "BG<70",
        "BG>250",
        "BG<50",
        "LBGI",
        "HBGI",
        "Risk Index",
    }
    assert len(results) == 2
    for f in (
        "performance_stats.csv",
        "risk_trace.csv",
        "CVGA_stats.csv",
        "BG_trace.png",
        "zone_stats.png",
        "risk_stats.png",
        "CVGA.png",
    ):
        assert (tmp_path / f).exists(), f
    import matplotlib.pyplot as plt

    plt.close("all")
