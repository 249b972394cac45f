"""Magni/Kovatchev blood-glucose risk index (reference: analysis/risk.py:5-17).

``fBG = 1.509 * (ln(BG)^1.084 - 5.381)``; LBGI is the mean of ``10*fBG^2``
over the samples with fBG < 0 within the horizon window, HBGI likewise for
fBG > 0, and RI = LBGI + HBGI.  Means over empty subsets are 0 (the
reference's ``nan_to_num``).  Implemented as masked sums so it is branchless,
works for scalar (horizon=1) and windowed inputs, and broadcasts over
batches on the leading axes.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def fbg(BG: jnp.ndarray) -> jnp.ndarray:
    """Risk-space transform of BG in mg/dL."""
    # ln(BG) ** 1.084 — matches numpy: requires ln(BG) >= 0 (BG >= 1 mg/dL);
    # guard tiny/negative BG (a crashed open-loop sim) to keep it NaN-free.
    logbg = jnp.log(jnp.maximum(BG, 1.0))
    return 1.509 * (jnp.power(logbg, 1.084) - 5.381)


def risk_index(
    BG: jnp.ndarray, horizon: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(LBGI, HBGI, RI) over the last ``horizon`` samples of the last axis.

    Matches reference semantics: the horizon window is ``BG[..., -horizon:]``
    and each of LBGI/HBGI averages only over its own sign's samples.
    """
    window = BG[..., -horizon:] if BG.ndim else BG[None]
    f = fbg(window)
    r = 10.0 * f * f
    neg = f < 0
    pos = f > 0
    nneg = neg.sum(axis=-1)
    npos = pos.sum(axis=-1)
    LBGI = jnp.where(nneg > 0, jnp.sum(r * neg, axis=-1) / jnp.maximum(nneg, 1), 0.0)
    HBGI = jnp.where(npos > 0, jnp.sum(r * pos, axis=-1) / jnp.maximum(npos, 1), 0.0)
    return LBGI, HBGI, LBGI + HBGI


def risk_scalar(BG: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fast path for a single BG sample (the env's horizon=1 per-step risk,
    reference simulation/env.py:83-85)."""
    f = fbg(BG)
    r = 10.0 * f * f
    LBGI = jnp.where(f < 0, r, 0.0)
    HBGI = jnp.where(f > 0, r, 0.0)
    return LBGI, HBGI, LBGI + HBGI


def neg_risk_reward(cgm_window: jnp.ndarray, window_len: jnp.ndarray) -> jnp.ndarray:
    """Dense alternative reward: -RI(CGM[t]) / 10.

    The default ``risk_diff_reward`` telescopes within an episode (the sum
    of diffs is risk[0] - risk[T]), which makes its per-step signal nearly
    zero-mean and hard for small-scale RL; the absolute-risk form is a
    stationary dense objective with the same optimum (CGM near the
    risk-minimizing ~112 mg/dL).  The reference exposes exactly this kind
    of pluggable reward through ``reward_fun``
    (reference: simulation/env.py:100-102, examples/custom_reward.py)."""
    _, _, r_now = risk_scalar(cgm_window[..., -1])
    return -r_now / 10.0


def risk_diff_reward(cgm_window: jnp.ndarray, window_len: jnp.ndarray) -> jnp.ndarray:
    """Default reward: risk(CGM[t-1]) - risk(CGM[t])
    (reference: simulation/env.py:27-33).  ``cgm_window`` is chronological;
    returns 0 while fewer than 2 samples exist."""
    _, _, r_now = risk_scalar(cgm_window[..., -1])
    _, _, r_prev = risk_scalar(cgm_window[..., -2])
    return jnp.where(window_len >= 2, r_prev - r_now, 0.0)
