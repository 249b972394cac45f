"""Live simulation viewer: 4-panel interactive matplotlib animation.

Capability parity with the reference's renderer
(reference: simulation/rendering.py:9-167): BG+CGM with glycemic-zone
shading, CHO, insulin, and LBGI/HBGI/RI risk traces, redrawn incrementally
from the accumulated results DataFrame with auto-expanding axes.
"""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


class Viewer:
    def __init__(self, start_time, patient_name, figsize=None):
        self.start_time = start_time
        self.patient_name = patient_name
        self.fig = None
        self._lines = None

    def _initialize(self):
        import matplotlib.pyplot as plt

        plt.ion()
        self.fig, self.axes = plt.subplots(
            4, 1, sharex=True, figsize=(9, 10)
        )
        ax_bg, ax_cho, ax_ins, ax_risk = self.axes
        # glycemic zone shading (reference: rendering.py:46-50)
        ax_bg.axhspan(70, 180, alpha=0.3, color="limegreen", lw=0)
        ax_bg.axhspan(50, 70, alpha=0.3, color="red", lw=0)
        ax_bg.axhspan(0, 50, alpha=0.3, color="darkred", lw=0)
        ax_bg.axhspan(180, 250, alpha=0.3, color="orange", lw=0)
        ax_bg.axhspan(250, 1000, alpha=0.3, color="darkorange", lw=0)
        ax_bg.set_ylim(40, 400)

        (self._l_bg,) = ax_bg.plot([], [], label="BG (mg/dL)")
        (self._l_cgm,) = ax_bg.plot([], [], label="CGM (mg/dL)")
        (self._l_cho,) = ax_cho.plot([], [], label="CHO (g/min)")
        (self._l_ins,) = ax_ins.plot([], [], label="insulin (U/min)")
        (self._l_lbgi,) = ax_risk.plot([], [], label="LBGI")
        (self._l_hbgi,) = ax_risk.plot([], [], label="HBGI")
        (self._l_ri,) = ax_risk.plot([], [], label="Risk Index")

        ax_bg.set_ylabel("BG (mg/dL)")
        ax_cho.set_ylabel("CHO (g/min)")
        ax_ins.set_ylabel("insulin (U/min)")
        ax_risk.set_ylabel("Risk Index")
        for ax in self.axes:
            ax.legend(loc="upper right")
        self.fig.suptitle(self.patient_name)
        self._lines = True

    def render(self, df):
        """Redraw from the accumulated results frame (Time-indexed)."""
        import matplotlib.pyplot as plt

        if self._lines is None:
            self._initialize()
        if not len(df):
            return
        t = df.index
        self._l_bg.set_data(t, df["BG"])
        self._l_cgm.set_data(t, df["CGM"])
        self._l_cho.set_data(t, df["CHO"])
        self._l_ins.set_data(t, df["insulin"])
        self._l_lbgi.set_data(t, df["LBGI"])
        self._l_hbgi.set_data(t, df["HBGI"])
        self._l_ri.set_data(t, df["Risk"])
        for ax in self.axes:
            ax.relim()
            ax.autoscale_view(scalex=True, scaley=ax is not self.axes[0])
        self.fig.canvas.draw_idle()
        try:
            self.fig.canvas.flush_events()
            plt.pause(0.001)
        except Exception:  # non-interactive backend
            pass

    def close(self):
        if self.fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self.fig)
            self.fig = None
            self._lines = None
