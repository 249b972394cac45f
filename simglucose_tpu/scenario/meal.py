"""Meal scenarios, materialized as arrays (reference: simulation/scenario.py,
scenario_gen.py).

The reference's ``RandomScenario`` draws a fresh daily meal plan whenever the
wall clock crosses midnight (scenario_gen.py:20-22): 6 meal slots
(breakfast/snack1/lunch/snack2/dinner/snack3) with occurrence probabilities
[.95,.3,.95,.3,.95,.3], truncated-normal meal times and normal amounts
(:33-60).  Here the plan is *materialized* as (times[6], amounts[6]) arrays
in the scenario state and regenerated via counter-keyed ``jax.random``; meal
lookup is a vectorized exact-minute match (first-match semantics like the
reference's ``list.index``, :26-31).

Single-env semantics; vmap over the batch.  For bit-exact MT19937 meal
sequences use :mod:`simglucose_tpu.compat.scenario` (exogenous minute-wise
meal arrays).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from simglucose_tpu.core.types import ScenarioState

MINUTES_PER_DAY = 1440

# Meal slot distributions (scenario_gen.py:36-44)
MEAL_PROB = (0.95, 0.3, 0.95, 0.3, 0.95, 0.3)
TIME_LB = tuple(x * 60.0 for x in (5, 9, 10, 14, 16, 20))
TIME_UB = tuple(x * 60.0 for x in (9, 10, 14, 16, 20, 23))
TIME_MU = tuple(x * 60.0 for x in (7, 9.5, 12, 15, 18, 21.5))
TIME_SIGMA = (60.0, 30.0, 60.0, 30.0, 60.0, 30.0)
AMOUNT_MU = (45.0, 10.0, 70.0, 10.0, 80.0, 10.0)
AMOUNT_SIGMA = (10.0, 5.0, 10.0, 5.0, 10.0, 5.0)


def create_daily_plan(
    key: jax.Array, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw one day's meal plan (scenario_gen.py:33-60).

    Returns (times[6], amounts[6]); skipped meals have time -1 (matches no
    minute) and amount 0.  Times are rounded to whole minutes-of-day;
    amounts to whole grams, floored at 0 — same rounding as the reference.
    """
    prob = jnp.asarray(MEAL_PROB, dtype)
    lb = jnp.asarray(TIME_LB, dtype)
    ub = jnp.asarray(TIME_UB, dtype)
    mu = jnp.asarray(TIME_MU, dtype)
    sigma = jnp.asarray(TIME_SIGMA, dtype)
    amu = jnp.asarray(AMOUNT_MU, dtype)
    asig = jnp.asarray(AMOUNT_SIGMA, dtype)

    # ONE counter-based draw feeds all 18 variates (occurrence, truncnorm
    # meal times via inverse-CDF, normal amounts) — this runs every env step
    # under SPMD (masked regen), so threefry invocations are the cost driver.
    u = jax.random.uniform(
        key, (18,), dtype=dtype, minval=jnp.finfo(dtype).tiny, maxval=1.0
    )
    occurs = u[:6] < prob
    a_cdf = jax.scipy.special.ndtr((lb - mu) / sigma)
    b_cdf = jax.scipy.special.ndtr((ub - mu) / sigma)
    zt = jax.scipy.special.ndtri(a_cdf + u[6:12] * (b_cdf - a_cdf))
    times = jnp.round(mu + sigma * zt)
    z_amt = jax.scipy.special.ndtri(u[12:18])
    amounts = jnp.maximum(jnp.round(amu + asig * z_amt), 0.0)
    times = jnp.where(occurs, times, -1.0)
    amounts = jnp.where(occurs, amounts, 0.0)
    return times, amounts


def scenario_init(
    key: jax.Array, start_min: jnp.ndarray, dtype=jnp.float32
) -> ScenarioState:
    """Scenario state at episode start (reference reset, scenario_gen.py:62-64).

    ``start_min`` is the episode start time in minutes-of-day.  The reference
    regenerates the plan when a get_action call lands exactly on midnight
    (t_sec < 1); starting *at* midnight therefore immediately discards the
    reset-time plan.  We reproduce that by tagging the initial plan with day
    -1 when start_min == 0 so the first lookup (day 0) regenerates.
    """
    start_min = jnp.asarray(start_min, jnp.int32)
    times, amounts = create_daily_plan(jax.random.fold_in(key, 0), dtype=dtype)
    day = jnp.where(start_min == 0, jnp.int32(-1), jnp.int32(0))
    return ScenarioState(
        meal_times=times,
        meal_amounts=amounts,
        day=day,
        start_min=start_min,
        key=key,
    )


def _lookup(times: jnp.ndarray, amounts: jnp.ndarray, minute_of_day) -> jnp.ndarray:
    """First-match exact-minute meal lookup (scenario_gen.py:26-31)."""
    match = times == minute_of_day.astype(times.dtype)
    first = jnp.argmax(match)
    return jnp.where(match.any(), amounts[first], 0.0)


def scenario_meals_for_step(
    state: ScenarioState,
    t0: jnp.ndarray,
    sample_time: int,
    dtype=jnp.float32,
) -> Tuple[ScenarioState, jnp.ndarray]:
    """Meals (g) for the ``sample_time`` minutes t0, t0+1, ..., of one env step.

    The daily regeneration (scenario_gen.py:20-22) is hoisted out of the
    mini-step loop: within one env step the wall clock spans at most two
    days, so one candidate next-day plan is drawn (masked select — correct
    under vmap with divergent per-patient clocks) and each minute picks the
    plan matching its own day.
    """
    mins = (
        state.start_min
        + jnp.asarray(t0, jnp.int32)
        + jnp.arange(sample_time, dtype=jnp.int32)
    )
    days = mins // MINUTES_PER_DAY
    mods = mins % MINUTES_PER_DAY

    day_end = days[-1]
    regen = day_end > state.day
    cand_times, cand_amounts = create_daily_plan(
        jax.random.fold_in(state.key, day_end + 1), dtype=dtype
    )
    new_times = jnp.where(regen, cand_times, state.meal_times)
    new_amounts = jnp.where(regen, cand_amounts, state.meal_amounts)
    new_day = jnp.where(regen, day_end, state.day)

    meals = []
    for i in range(sample_time):
        use_new = days[i] >= new_day
        times_i = jnp.where(use_new, new_times, state.meal_times)
        amounts_i = jnp.where(use_new, new_amounts, state.meal_amounts)
        meals.append(_lookup(times_i, amounts_i, mods[i]))
    meals = jnp.stack(meals)

    new_state = state._replace(
        meal_times=new_times, meal_amounts=new_amounts, day=new_day
    )
    return new_state, meals


def scenario_lookup_for_step(
    state: ScenarioState, t0: jnp.ndarray, sample_time: int
) -> jnp.ndarray:
    """Meal lookup for one env step WITHOUT the regeneration check — the
    cadenced engines (envs/rollout.py) hoist :func:`scenario_regen_now` to
    chunk boundaries instead of paying the candidate-plan draw (18 threefry
    variates + 12 ndtri/ndtr) every step.

    Deferring the midnight regen by up to one chunk is trajectory-exact:
    every meal slot is truncated to [05:00, 23:00] (TIME_LB/TIME_UB;
    reference scenario_gen.py:36-44), so for chunks shorter than 5 simulated
    hours no minute-of-day in the deferred window can match a meal in either
    the old or the new plan.
    """
    mins = (
        state.start_min
        + jnp.asarray(t0, jnp.int32)
        + jnp.arange(sample_time, dtype=jnp.int32)
    )
    mods = mins % MINUTES_PER_DAY
    meals = [
        _lookup(state.meal_times, state.meal_amounts, mods[i])
        for i in range(sample_time)
    ]
    return jnp.stack(meals)


def scenario_regen_now(
    state: ScenarioState, t_now: jnp.ndarray, dtype=jnp.float32
) -> ScenarioState:
    """Catch the scenario state up to the patient clock ``t_now`` (minutes
    since episode start): if the wall clock has entered a new day since the
    plan was drawn, regenerate it — with exactly the key the streaming path
    (:func:`scenario_meals_for_step`) would have used at the midnight
    crossing, ``fold_in(key, day + 1)``, so the produced plan is
    bit-identical, just drawn up to a chunk late (see
    :func:`scenario_lookup_for_step` for why that is trajectory-exact).
    """
    day_now = (
        state.start_min + jnp.asarray(t_now, jnp.int32)
    ) // MINUTES_PER_DAY
    regen = day_now > state.day
    cand_times, cand_amounts = create_daily_plan(
        jax.random.fold_in(state.key, day_now + 1), dtype=dtype
    )
    return state._replace(
        meal_times=jnp.where(regen, cand_times, state.meal_times),
        meal_amounts=jnp.where(regen, cand_amounts, state.meal_amounts),
        day=jnp.where(regen, day_now, state.day),
    )


def meals_pregenerate(
    key: jax.Array,
    start_min: jnp.ndarray,
    n_minutes: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """The meal stream of the first ``n_minutes`` episode minutes as one
    vectorized [n_minutes] g-per-minute array — BIT-IDENTICAL to the
    streaming :func:`scenario_init` + :func:`scenario_meals_for_step` chain
    with the same ``key``/``start_min`` (pinned by
    tests/test_rollout_pregen.py).

    This is the fixed-horizon fast path (envs/rollout.py ``rollout(pregen=
    True)``): the meal stream is state-independent, so hoisting it out of
    the env scan removes the per-step candidate-plan draw (18 threefry
    variates + 12 ndtri/ndtr evaluations for a regeneration that actually
    fires once per simulated day, scenario_gen.py:20-22) from the hot loop;
    the env then runs in exogenous-scenario mode slicing this plane by the
    patient clock.

    Plan keying reproduces the streaming day chain exactly:

      * ``start_min > 0``: day 0 uses the reset-time plan
        (``fold_in(key, 0)``, scenario_init);
      * ``start_min == 0``: the reset-time plan is tagged day -1 and the
        first step regenerates (scenario_init's midnight rule), so day 0
        uses ``fold_in(key, 1)``;
      * day d >= 1 regenerates when the step's last minute first enters day
        d, with ``fold_in(key, d + 1)`` (scenario_meals_for_step) — and
        per-minute plan selection is by each minute's own day, so a step
        straddling midnight reads the old plan for its pre-midnight minutes.
    """
    start_min = jnp.asarray(start_min, jnp.int32)
    # start_min is a minute-of-day (< 1440), so n_minutes of episode span at
    # most this many distinct days (static shape under traced start_min):
    n_days = (MINUTES_PER_DAY - 1 + n_minutes - 1) // MINUTES_PER_DAY + 1

    def plan_for_day(d):
        ctr = jnp.where(
            d == 0, jnp.where(start_min == 0, 1, 0), d + 1
        ).astype(jnp.uint32)
        return create_daily_plan(jax.random.fold_in(key, ctr), dtype=dtype)

    times, amounts = jax.vmap(plan_for_day)(jnp.arange(n_days))  # [D, 6]

    mins = start_min + jnp.arange(n_minutes, dtype=jnp.int32)
    days = mins // MINUTES_PER_DAY
    mods = (mins % MINUTES_PER_DAY).astype(times.dtype)
    t_rows = times[days]  # [n_minutes, 6]
    a_rows = amounts[days]
    match = t_rows == mods[:, None]
    first = jnp.argmax(match, axis=1)
    return jnp.where(
        match.any(axis=1), jnp.take_along_axis(a_rows, first[:, None], 1)[:, 0], 0.0
    )


def custom_meals_for_step(
    times_min: jnp.ndarray,
    amounts: jnp.ndarray,
    t0: jnp.ndarray,
    sample_time: int,
) -> jnp.ndarray:
    """CustomScenario lookup (reference: simulation/scenario.py:33-42):
    ``times_min`` are exact minutes since episode start; first match wins."""
    mins = t0 + jnp.arange(sample_time)
    match = times_min[None, :] == mins[:, None]  # [sample_time, K]
    first = jnp.argmax(match, axis=1)
    return jnp.where(match.any(axis=1), amounts[first], 0.0)
