"""Meal scenarios: bit-exact compat path vs golden; native daily-plan law."""
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simglucose_tpu.compat.scenario import reference_meal_seq
from simglucose_tpu.scenario.meal import (
    MINUTES_PER_DAY,
    create_daily_plan,
    custom_meals_for_step,
    scenario_init,
    scenario_meals_for_step,
)

from conftest import load_golden


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("hour", [0, 6, 23])
def test_compat_meals_bitexact(seed, hour):
    golden = load_golden(f"meals_seed{seed}_h{hour}.npz")["meals"]
    ours = reference_meal_seq(seed, datetime(2018, 1, 1, hour, 0, 0), len(golden))
    np.testing.assert_array_equal(ours, golden)


def test_native_daily_plan_law():
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    times, amounts = jax.vmap(lambda k: create_daily_plan(k, dtype=jnp.float64))(keys)
    times, amounts = np.asarray(times), np.asarray(amounts)
    occ = times >= 0
    # occurrence probabilities ~ [.95,.3,.95,.3,.95,.3] (scenario_gen.py:38)
    rates = occ.mean(axis=0)
    np.testing.assert_allclose(rates, [0.95, 0.3, 0.95, 0.3, 0.95, 0.3], atol=0.08)
    # times within the truncation bounds (scenario_gen.py:39-40)
    lb = np.array([5, 9, 10, 14, 16, 20]) * 60
    ub = np.array([9, 10, 14, 16, 20, 23]) * 60
    for j in range(6):
        tj = times[occ[:, j], j]
        assert tj.min() >= lb[j] - 0.5 and tj.max() <= ub[j] + 0.5
        assert tj == pytest.approx(np.round(tj))  # whole minutes
    # amounts ~ N(mu, sigma), rounded, floored at 0
    amt_mu = amounts[occ].reshape(-1)
    assert (amt_mu >= 0).all()
    mean_major = amounts[occ[:, 4], 4].mean()
    assert abs(mean_major - 80.0) < 2.0


@jax.jit
def _scan_scenario(state, t0s):
    def body(state, t0):
        state, meals = scenario_meals_for_step(state, t0, 3, dtype=jnp.float64)
        return state, (meals, state.day, state.meal_times)

    return jax.lax.scan(body, state, t0s)


def test_native_scenario_regenerates_daily():
    """One plan per day; the plan changes at midnight (scenario_gen.py:20-22)."""
    state = scenario_init(jax.random.PRNGKey(3), jnp.int32(6 * 60), dtype=jnp.float64)
    t0s = jnp.arange(0, 2 * MINUTES_PER_DAY, 3, dtype=jnp.int32)
    _, (_, days, times) = _scan_scenario(state, t0s)
    days, times = np.asarray(days), np.asarray(times)
    uniq = np.unique(days)
    assert len(uniq) >= 2
    plan_by_day = [times[days == d][0] for d in uniq]
    assert not np.array_equal(plan_by_day[0], plan_by_day[1])


def test_native_scenario_delivers_plan_meals():
    """Every valid (time, amount) in the day-0 plan is delivered at its
    minute when the episode starts mid-day."""
    key = jax.random.PRNGKey(11)
    state = scenario_init(key, jnp.int32(60), dtype=jnp.float64)  # 01:00 start
    plan_t = np.asarray(state.meal_times)
    plan_a = np.asarray(state.meal_amounts)
    n_steps = (MINUTES_PER_DAY - 60) // 3
    t0s = jnp.arange(0, n_steps * 3, 3, dtype=jnp.int32)
    _, (meals, _, _) = _scan_scenario(state, t0s)
    meals = np.asarray(meals).reshape(-1)  # minute-wise, offset 60
    got = {60 + i: m for i, m in enumerate(meals) if m > 0}
    expected = {
        int(t): float(a) for t, a in zip(plan_t, plan_a) if t >= 60 and a > 0
    }
    assert got == expected


def test_custom_scenario_lookup():
    times = jnp.asarray([10, 11, 200], jnp.int32)
    amounts = jnp.asarray([30.0, 15.0, 50.0])
    meals = custom_meals_for_step(times, amounts, jnp.int32(9), 3)
    np.testing.assert_array_equal(np.asarray(meals), [0.0, 30.0, 15.0])
    meals = custom_meals_for_step(times, amounts, jnp.int32(198), 3)
    np.testing.assert_array_equal(np.asarray(meals), [0.0, 0.0, 50.0])
