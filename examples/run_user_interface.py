"""Interactive simulation wizard
(capability parity: reference examples/run_user_interface.py)."""
from simglucose_tpu.sim.user_interface import simulate

simulate()
