"""High-level simulation API: one-program cohort sims + interactive UI."""
from simglucose_tpu.sim.engine import SimObj, batch_sim, sim, simulate

__all__ = ["simulate", "SimObj", "sim", "batch_sim"]
