"""The pregenerated-stream fast path must be BIT-IDENTICAL to the
streaming path.

``rollout(pregen=True)`` (envs/rollout.py pregen_env) hoists the native
CGM-noise chain and the random meal scenario out of the env scan as
exogenous planes — the fixed-horizon XLA-path optimization.  These tests
pin the contract that makes that safe: the planes reproduce the streaming
draws bit-for-bit, so every observable output of the rollout is unchanged.

Reference laws being reproduced: sensor/noise_gen.py:15-88 (AR(1) lattice +
Johnson-SU + cubic interpolation), scenario_gen.py:20-60 (daily meal plan,
midnight regeneration).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simglucose_tpu.controllers.functional import pid_controller
from simglucose_tpu.envs.build import cohort_names, make_env
from simglucose_tpu.envs.rollout import pregen_env, rollout, rollout_batch


def test_noise_pregenerate_matches_streaming():
    """noise_pregenerate == n successive noise_next calls, bitwise."""
    from simglucose_tpu.core.types import SensorParams
    from simglucose_tpu.ops.noise import (
        noise_lattice_init,
        noise_next,
        noise_pregenerate,
    )
    from simglucose_tpu.params import load_sensor_params

    params = load_sensor_params("Dexcom", dtype=np.float32)
    key = jax.random.PRNGKey(7)
    n, st = 100, 3

    plane = noise_pregenerate(params, key, n, st, dtype=jnp.float32)

    e, lattice, seg, lattice_next = noise_lattice_init(
        params, key, dtype=jnp.float32
    )
    vals = []
    for i in range(n):
        v, (e, lattice, seg, lattice_next) = noise_next(
            params, st, e, lattice, seg, lattice_next, jnp.int32(i), key
        )
        vals.append(float(v))
    np.testing.assert_array_equal(np.asarray(plane), np.asarray(vals))


@pytest.mark.parametrize("start_min", [0, 435, 1380])
def test_meals_pregenerate_matches_streaming(start_min):
    """meals_pregenerate == the scenario_init + scenario_meals_for_step
    stream, bitwise — including the midnight regeneration and the
    start-at-midnight immediate-regen rule (scenario_gen.py:20-22)."""
    from simglucose_tpu.scenario.meal import (
        meals_pregenerate,
        scenario_init,
        scenario_meals_for_step,
    )

    key = jax.random.PRNGKey(3)
    st = 3
    n_steps = 560  # 28 h: crosses at least one midnight from any start
    n_min = n_steps * st

    plane = meals_pregenerate(key, start_min, n_min, dtype=jnp.float32)

    state = scenario_init(key, start_min, dtype=jnp.float32)
    got = []
    for s in range(n_steps):
        state, meals = scenario_meals_for_step(
            state, jnp.int32(s * st), st, dtype=jnp.float32
        )
        got.extend(np.asarray(meals).tolist())
    np.testing.assert_array_equal(np.asarray(plane), np.asarray(got))
    assert float(jnp.sum(plane)) > 0.0  # the day actually contains meals


@pytest.mark.parametrize("start_min", [0, 1290])
def test_rollout_pregen_matches_streaming(start_min):
    """rollout(pregen=True) reproduces the streaming trajectories to within
    compiler-rounding ulps — same key, same controller, horizon crossing
    midnight.

    The random STREAMS are bit-identical (the two tests above); the full
    trajectories differ only by XLA's fusion/FMA-contraction choices on the
    two different graphs (observed: few-ulp, ~1e-7 relative on CGM/BG) —
    orders of magnitude below the native-mode integrator tolerance
    (tests/test_integrators.py: rk4 vs rk45 ~1.7e-3 mg/dL)."""
    cfg, params = make_env("adolescent#001", dtype=np.float32)
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=-1e-4, I=-1e-7)
    n_steps = 320  # 16 h

    run = jax.jit(
        partial(
            rollout, cfg, params, ctrl_init=ctrl0, ctrl_fn=ctrl,
            n_steps=n_steps, start_min=start_min,
        ),
        static_argnames=("pregen",),
    )
    _, reset_a, traj_a = run(key=jax.random.PRNGKey(11), pregen=False)
    _, reset_b, traj_b = run(key=jax.random.PRNGKey(11), pregen=True)

    # reward = risk[t-1] - risk[t]: the difference of near-equal values
    # amplifies the ulp noise absolutely (cancellation) -> wider atol
    tols = {"reward": 1e-4}
    for field in ("CGM", "BG", "CHO", "insulin", "reward", "risk"):
        np.testing.assert_allclose(
            np.asarray(getattr(traj_a, field)),
            np.asarray(getattr(traj_b, field)),
            rtol=1e-6, atol=tols.get(field, 1e-6), err_msg=field,
        )
    np.testing.assert_array_equal(
        np.asarray(traj_a.done), np.asarray(traj_b.done)
    )
    np.testing.assert_array_equal(
        np.asarray(reset_a.observation.CGM), np.asarray(reset_b.observation.CGM)
    )
    # the simulation is live (meals happened, sensor noise is on)
    assert float(jnp.sum(traj_a.CHO)) > 0.0
    assert float(jnp.std(traj_a.CGM - traj_a.BG)) > 1.0


def test_rollout_batch_pregen_matches_streaming():
    """The batched engine (simulate()'s XLA path) with pregen=True matches
    streaming across a cohort with per-patient keys (ulp tolerance — see
    test_rollout_pregen_matches_streaming)."""
    B = 8
    cfg, params = make_env(
        cohort_names(B), batch=True, random_init_bg=True, dtype=np.float32
    )
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=-1e-4, I=-1e-7)
    keys = jax.random.split(jax.random.PRNGKey(5), B)

    run = jax.jit(
        partial(
            rollout_batch, cfg, params, keys, ctrl_fn=ctrl, n_steps=160,
            start_min=600,
        ),
        static_argnames=("pregen",),
    )
    _, _, traj_a = run(ctrl_init=ctrl0, pregen=False)
    _, _, traj_b = run(ctrl_init=ctrl0, pregen=True)
    assert traj_a.CGM.shape == (B, 160)
    np.testing.assert_allclose(
        np.asarray(traj_a.CGM), np.asarray(traj_b.CGM), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(traj_a.CHO), np.asarray(traj_b.CHO), rtol=1e-6, atol=1e-6
    )


def test_pregen_rejects_non_native_modes():
    cfg, params = make_env("adolescent#001", dtype=np.float32)
    import dataclasses

    bad = dataclasses.replace(cfg, scenario_mode="none")
    with pytest.raises(ValueError, match="pregen requires"):
        pregen_env(bad, params, jax.random.PRNGKey(0), 10, 0)
