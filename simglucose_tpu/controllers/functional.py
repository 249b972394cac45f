"""Pure functional controllers.

A controller is a pair (init_state, policy) where

    policy(ctrl_state, result: StepResult) -> (ctrl_state, CtrlAction)

``result`` is the previous step's :class:`StepResult` (the reference passes
observation/reward/done plus the info dict — controller/base.py:6-34; the
StepResult carries the same fields).  Controllers are single-env and get
vmapped with the env.

Implementations mirror the reference:
  * BB (basal-bolus therapy), controller/basal_bolus_ctrller.py:15-83
  * PID, controller/pid_ctrller.py:8-40
plus trivial constant/zero policies for benchmarking, and any RL policy can
be adapted by closing over network params.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax.numpy as jnp

from simglucose_tpu.core.types import (
    CtrlAction,
    PatientParams,
    QuestParams,
    StepResult,
)

ControllerFn = Callable[[Any, StepResult], Tuple[Any, CtrlAction]]


class BBParams(NamedTuple):
    """Per-patient therapy constants for the basal-bolus controller."""

    basal: jnp.ndarray  # u2ss * BW / 6000, U/min (basal_bolus_ctrller.py:64)
    CR: jnp.ndarray
    CF: jnp.ndarray


def bb_params(patient: PatientParams, quest: QuestParams) -> BBParams:
    return BBParams(
        basal=patient.u2ss * patient.BW / 6000.0, CR=quest.CR, CF=quest.CF
    )


def bb_controller(
    bb: BBParams, sample_time: int, target: float = 140.0
) -> tuple[Any, ControllerFn]:
    """Standard basal-bolus therapy (basal_bolus_ctrller.py:34-80).

    bolus [U] = meal*dt/CR + 1[G>150]*(G-target)/CF, emitted as U/min.
    ``meal`` is the previous step's CHO info (g/min), as in the reference
    closed loop (sim_engine.py:36 passes info['meal']).
    """

    def policy(state, result: StepResult):
        glucose = result.observation.CGM
        meal = result.CHO
        bolus_u = (meal * sample_time) / bb.CR + (glucose > 150.0) * (
            glucose - target
        ) / bb.CF
        bolus = jnp.where(meal > 0, bolus_u / sample_time, 0.0)
        return state, CtrlAction(basal=bb.basal, bolus=bolus)

    return (), policy


def bb_policy(sample_time: int, target: float = 140.0) -> ControllerFn:
    """Basal-bolus policy with the therapy params carried IN the controller
    state (a :class:`BBParams` pytree) instead of closed over — this form
    vmaps over per-patient params (``ctrl_in_axes=0`` in
    :func:`simglucose_tpu.envs.rollout.rollout_batch`)."""

    def policy(bb: BBParams, result: StepResult):
        glucose = result.observation.CGM
        meal = result.CHO
        bolus_u = (meal * sample_time) / bb.CR + (glucose > 150.0) * (
            glucose - target
        ) / bb.CF
        bolus = jnp.where(meal > 0, bolus_u / sample_time, 0.0)
        return bb, CtrlAction(basal=bb.basal, bolus=bolus)

    return policy


class PIDState(NamedTuple):
    integrated: jnp.ndarray
    prev: jnp.ndarray


def pid_controller(
    sample_time: int,
    P: float = 1.0,
    I: float = 0.0,
    D: float = 0.0,
    target: float = 140.0,
    dtype=jnp.float32,
) -> tuple[PIDState, ControllerFn]:
    """PID on CGM, emitted as basal (pid_ctrller.py:17-36).  Update order
    matches the reference: control uses the *previous* integrated state."""

    def policy(state: PIDState, result: StepResult):
        bg = result.observation.CGM
        control = (
            P * (bg - target)
            + I * state.integrated
            + D * (bg - state.prev) / sample_time
        )
        new_state = PIDState(
            integrated=state.integrated + (bg - target) * sample_time, prev=bg
        )
        return new_state, CtrlAction(basal=control, bolus=jnp.zeros_like(control))

    init = PIDState(
        integrated=jnp.asarray(0.0, dtype), prev=jnp.asarray(0.0, dtype)
    )
    return init, policy


def constant_controller(basal: float, dtype=jnp.float32) -> tuple[Any, ControllerFn]:
    """Fixed basal rate, zero bolus — open-loop benchmark policy."""

    def policy(state, result: StepResult):
        return state, CtrlAction(
            basal=jnp.asarray(basal, dtype), bolus=jnp.asarray(0.0, dtype)
        )

    return (), policy
