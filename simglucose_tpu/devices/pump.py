"""Insulin pump quantization (reference: actuator/pump.py:11-43).

Pure functions: commanded U/min -> pmol/min, rounded to the pump increment
(round-half-to-even, matching numpy), clamped to hardware limits, back to
U/min.  Broadcasts over any batch shape.
"""
from __future__ import annotations

import jax.numpy as jnp

from simglucose_tpu.core.types import PumpParams

U2PMOL = 6000.0  # U -> pmol (pump.py:12)


def pump_bolus(params: PumpParams, amount: jnp.ndarray) -> jnp.ndarray:
    """Quantize + clamp a bolus command in U/min (pump.py:23-30)."""
    bol = amount * U2PMOL
    bol = jnp.round(bol / params.inc_bolus) * params.inc_bolus
    bol = bol / U2PMOL
    return jnp.clip(bol, params.min_bolus, params.max_bolus)


def pump_basal(params: PumpParams, amount: jnp.ndarray) -> jnp.ndarray:
    """Quantize + clamp a basal command in U/min (pump.py:32-39)."""
    bas = amount * U2PMOL
    bas = jnp.round(bas / params.inc_basal) * params.inc_basal
    bas = bas / U2PMOL
    return jnp.clip(bas, params.min_basal, params.max_basal)
