"""Population-scale cohort simulation on the pallas in-VMEM engine.

Runs 4096 virtual patients for a simulated day (~2M env steps, ~6M patient
minutes) in a couple of seconds of device time on one TPU chip — the
high-throughput analog of the reference's batch_sim over a process pool
(reference: simulation/sim_engine.py:65-76).  The ``engine='pallas'``
fast path supports BB/PID controllers with random daily meal scenarios;
anything else (custom controllers/rewards/scenarios) runs on the general
``engine='xla'`` path.
"""
from datetime import timedelta

from simglucose_tpu.envs.build import cohort_names
from simglucose_tpu.sim import simulate

df = simulate(
    sim_time=timedelta(hours=24),
    patient_names=cohort_names(4096),  # 30 archetypes cycled to 4096
    controller="BB",
    scenario_seed=7,
    engine="pallas",  # 'auto' also picks pallas at this cohort size on TPU
)

bg = df["BG"].to_numpy()
tir = ((bg >= 70) & (bg <= 180)).mean() * 100
print(f"cohort: {bg.size} samples; BG mean {bg.mean():.1f} mg/dL; "
      f"time-in-[70,180] {tir:.1f}%")
