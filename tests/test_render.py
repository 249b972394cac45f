"""Viewer replay test (reference: tests/test_render.py:16-25)."""
import matplotlib

matplotlib.use("Agg")

from datetime import datetime, timedelta  # noqa: E402

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from simglucose_tpu.analysis.rendering import Viewer  # noqa: E402


def test_viewer_replays_frame_by_frame():
    rng = np.random.RandomState(0)
    n = 30
    t0 = datetime(2018, 1, 1)
    df = pd.DataFrame(
        {
            "BG": rng.uniform(90, 200, n),
            "CGM": rng.uniform(90, 200, n),
            "CHO": np.zeros(n),
            "insulin": np.full(n, 0.01),
            "LBGI": np.zeros(n),
            "HBGI": rng.uniform(0, 3, n),
            "Risk": rng.uniform(0, 3, n),
        },
        index=pd.Index(
            [t0 + timedelta(minutes=3 * i) for i in range(n)], name="Time"
        ),
    )
    v = Viewer(t0, "adolescent#001")
    for i in range(1, n, 10):
        v.render(df.iloc[:i])
    v.close()
    assert v.fig is None


def test_viewer_incremental_axis_windows():
    """The reference Viewer's explicit window law (rendering.py:119-167):
    y-windows grow by a 10% margin only when data exceeds them (never
    shrink), and the shared time window extends in 6 h blocks as the
    newest sample approaches the right edge."""
    import matplotlib.dates as mdates

    rng = np.random.RandomState(1)
    t0 = datetime(2018, 1, 1)

    def frame(n, bg_hi=200.0):
        return pd.DataFrame(
            {
                "BG": rng.uniform(90, bg_hi, n),
                "CGM": rng.uniform(90, bg_hi, n),
                "CHO": np.zeros(n),
                "insulin": np.full(n, 0.01),
                "LBGI": np.zeros(n),
                "HBGI": rng.uniform(0, 3, n),
                "Risk": rng.uniform(0, 3, n),
            },
            index=pd.Index(
                [t0 + timedelta(minutes=3 * i) for i in range(n)],
                name="Time",
            ),
        )

    v = Viewer(t0, "adolescent#001")
    v.render(frame(10))
    x0 = v.axes[-1].get_xlim()
    y_bg = v.axes[0].get_ylim()
    # small in-window update: no axis movement
    v.render(frame(20))
    assert v.axes[-1].get_xlim() == x0
    assert v.axes[0].get_ylim() == y_bg
    # BG spike above the window -> expand with the reference's 10% margin
    df = frame(20, bg_hi=200.0)
    df.loc[df.index[5], "BG"] = 500.0
    v.render(df)
    assert v.axes[0].get_ylim()[1] >= 500.0 * 1.1 - 1e-6
    # time crossing within 30 min of the right edge -> +6 h block
    n_cross = int((6 * 60 - 20) / 3)  # within 30 min of t0+6h
    v.render(frame(n_cross))
    x1 = v.axes[-1].get_xlim()
    grown_h = (
        mdates.num2date(x1[1]) - mdates.num2date(x0[1])
    ).total_seconds() / 3600.0
    assert abs(grown_h - 6.0) < 1e-6
    v.close()
