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
