"""rllab compatibility shim.

The reference exposes its step results through rllab's ``Step`` convenience
constructor when rllab is installed, and otherwise defines an identical
namedtuple fallback (reference: simulation/env.py:9-20).  rllab itself is
long-dead (py2-era); this module provides the same surface so code written
against the reference's rllab-era API keeps working, plus a converter from
the native :class:`~simglucose_tpu.core.types.StepResult`.

The modern training path is the native PPO stack (:mod:`simglucose_tpu.rl`)
— see ``examples/train_ppo.py`` for the analog of the reference's
``examples/run_rllab.py`` DDPG script.
"""
from __future__ import annotations

from collections import namedtuple

_Step = namedtuple("Step", ["observation", "reward", "done", "info"])


def Step(observation, reward, done, **kwargs):
    """rllab-style step tuple: extra diagnostics go into ``info`` as kwargs
    (reference: simulation/env.py:13-20)."""
    return _Step(observation, reward, done, kwargs)


def step_result_to_rllab(
    res, sample_time=None, patient_name=None, patient_state=None, time=None
) -> _Step:
    """Convert a native :class:`StepResult` (single env, concrete values) to
    the rllab ``Step`` tuple the reference's ``T1DSimEnv.step`` returns,
    info keys included (reference: simulation/env.py:106-117)."""
    return Step(
        observation=res.observation,
        reward=float(res.reward),
        done=bool(res.done),
        sample_time=sample_time,
        patient_name=patient_name,
        meal=float(res.CHO),
        patient_state=patient_state,
        time=time,
        bg=float(res.BG),
        lbgi=float(res.LBGI),
        hbgi=float(res.HBGI),
        risk=float(res.risk),
    )
