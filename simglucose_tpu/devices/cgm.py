"""Functional CGM sensor (reference: sensor/cgm.py:12-50).

The sensor samples the patient's subcutaneous glucose every ``sample_time``
minutes (gate ``patient.t % sample_time == 0``, cgm.py:27), adds one value
from the colored-noise stream, clamps to the hardware range, and zero-order-
holds between samples.  The env layer calls :func:`sensor_sample` only at
sampling minutes (the schedule is static under jit), so the ZOH is implicit
in carrying ``last_CGM``.

Two noise modes, chosen statically by the env config:
  * native      — on-device streaming AR(1)/Johnson/cubic chain
                  (:mod:`simglucose_tpu.ops.noise`), keyed by jax.random.
  * exogenous   — noise values come from a caller-supplied array (e.g. the
                  MT19937-bit-exact host pregeneration in
                  :mod:`simglucose_tpu.compat.noise`), indexed by
                  ``sample_count``.

Single-sensor semantics; vmap over the patient batch.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from simglucose_tpu.core.types import SensorParams, SensorState
from simglucose_tpu.ops.noise import noise_lattice_init, noise_next


def sensor_init(
    params: SensorParams, key: jax.Array, dtype=jnp.float32
) -> SensorState:
    """Fresh sensor state (reference: cgm.py:47-50 reset)."""
    e, lattice, seg, lattice_next = noise_lattice_init(params, key, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    return SensorState(
        last_CGM=zero,
        e=e,
        lattice=lattice,
        seg=seg,
        lattice_next=lattice_next,
        sample_count=jnp.int32(0),
        key=key,
    )


def sensor_sample(
    params: SensorParams,
    sample_time: int,
    state: SensorState,
    BG: jnp.ndarray,
    noise_seq: Optional[jnp.ndarray] = None,
    noise_value: Optional[jnp.ndarray] = None,
) -> Tuple[SensorState, jnp.ndarray]:
    """Draw one CGM sample: BG + noise, clamped (cgm.py:28-33).

    Call only at sampling minutes; between samples read ``state.last_CGM``
    (the ZOH, cgm.py:35-36).  With ``noise_seq`` given, the noise comes from
    ``noise_seq[sample_count]`` (exogenous/bit-exact mode) and the on-device
    lattice state is left untouched.  With ``noise_value`` given, that
    scalar IS the noise (scan-xs fast path, envs/rollout.py ``pregen`` —
    the value is fed per step by ``lax.scan`` so no gather is emitted).
    """
    if noise_value is not None:
        noise = noise_value
        e, lattice, seg, lattice_next = (
            state.e,
            state.lattice,
            state.seg,
            state.lattice_next,
        )
    elif noise_seq is not None:
        noise = noise_seq[state.sample_count]
        e, lattice, seg, lattice_next = (
            state.e,
            state.lattice,
            state.seg,
            state.lattice_next,
        )
    else:
        noise, (e, lattice, seg, lattice_next) = noise_next(
            params,
            sample_time,
            state.e,
            state.lattice,
            state.seg,
            state.lattice_next,
            state.sample_count,
            state.key,
        )
    CGM = jnp.clip(BG + noise, params.min, params.max)
    new_state = SensorState(
        last_CGM=CGM,
        e=e,
        lattice=lattice,
        seg=seg,
        lattice_next=lattice_next,
        sample_count=state.sample_count + 1,
        key=state.key,
    )
    return new_state, CGM
