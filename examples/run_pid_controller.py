"""PID closed loop (capability parity: reference examples/run_pid_controller.py)."""
from datetime import datetime, timedelta

from simglucose_tpu.sim import simulate

df = simulate(
    sim_time=timedelta(hours=24),
    patient_names=["adolescent#001"],
    controller="PID",
    start_time=datetime(2018, 1, 1),
)
print(df.loc["adolescent#001"][["BG", "CGM", "insulin"]].describe())
