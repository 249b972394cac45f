"""Rollout engines: jit(vmap(scan)) over the functional env.

This replaces the reference's ``SimObj.simulate`` while-loop + pathos
process pool (reference: simulation/sim_engine.py:29-39,65-76) with a single
compiled program: time = ``lax.scan`` (sequential on device), patients =
``vmap`` (lanes), devices = shard_map over a Mesh
(:mod:`simglucose_tpu.parallel.sharding`).

Two engines:
  * :func:`rollout`         — fixed-horizon closed-loop rollout of a
                              (controller, env) pair, stacked histories.
  * :func:`rollout_autoreset` — RL-style batched rollout with masked
                              re-initialization when episodes terminate
                              (the reference gym wrapper builds a whole new
                              env per reset, simglucose_gym_env.py:48-51;
                              here that is a masked state swap).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from simglucose_tpu.analysis.risk import risk_diff_reward
from simglucose_tpu.controllers.functional import ControllerFn
from simglucose_tpu.core.types import EnvState, StepResult
from simglucose_tpu.envs.functional import (
    EnvConfig,
    EnvParams,
    env_reset,
    env_step,
)


def pregen_env(
    cfg: EnvConfig,
    params: EnvParams,
    key: jax.Array,
    n_steps: int,
    start_min: jnp.ndarray,
) -> Tuple[EnvConfig, EnvParams]:
    """Hoist the state-independent random streams out of the env scan.

    The native CGM-noise chain (ops/noise.py) and the random meal scenario
    (scenario/meal.py) depend only on (key, sample index / minute) — never
    on the trajectory — so for a FIXED-horizon rollout both streams can be
    pregenerated as vectorized planes and the env run in exogenous mode
    indexing them.  This removes the per-step threefry ``fold_in`` +
    ``normal`` (erf_inv) and the per-step candidate daily-plan draw (18
    variates + 12 ndtri/ndtr for a regen that fires once per simulated day)
    from the scan body, leaving essentially the ODE + device math — the
    fusion-boundary cost the reference's 1-minute loop pays per step
    (reference: simulation/sim_engine.py:33-37) collapses into one parallel
    pregeneration pass.

    The planes reproduce the streaming draws BIT-exactly
    (noise_pregenerate / meals_pregenerate; key derivation mirrors
    env_reset's split), and the produced trajectories match the streaming
    path to within XLA fusion/FMA-contraction ulps (~1e-7 relative,
    tests/test_rollout_pregen.py) — far below the native-mode integrator
    tolerance.  Only fixed-horizon engines can use this — auto-reset
    re-keys the streams at data-dependent times.

    Returns ``(cfg', params')`` with the exogenous modes set and the planes
    attached.  Single-env semantics (vmap for a batch).
    """
    from simglucose_tpu.ops.noise import noise_pregenerate
    from simglucose_tpu.scenario.meal import meals_pregenerate

    if cfg.noise_mode != "native" or cfg.scenario_mode != "random":
        raise ValueError(
            "pregen requires noise_mode='native' and scenario_mode='random' "
            f"(got {cfg.noise_mode!r}/{cfg.scenario_mode!r}) — other modes "
            "already carry their streams as arrays"
        )
    dtype = params.patient.x0.dtype
    # env_reset's split — the sensor/scenario subkeys must match exactly
    _, k_sensor, k_scenario = jax.random.split(key, 3)
    noise_seq = noise_pregenerate(
        params.sensor, k_sensor, n_steps + 2, cfg.sample_time, dtype=dtype
    )  # reset consumes samples 0-1 (env.py:126,142), steps 2..n_steps+1
    meal_seq = meals_pregenerate(
        k_scenario, start_min, n_steps * cfg.sample_time, dtype=dtype
    )
    cfg = dataclasses.replace(
        cfg, noise_mode="exogenous", scenario_mode="exogenous"
    )
    return cfg, params._replace(noise_seq=noise_seq, meal_seq=meal_seq)


def rollout(
    cfg: EnvConfig,
    params: EnvParams,
    key: jax.Array,
    ctrl_init: Any,
    ctrl_fn: ControllerFn,
    n_steps: int,
    start_min: jnp.ndarray = 0,
    init_state: Optional[jnp.ndarray] = None,
    reward_fun=risk_diff_reward,
    pregen: bool = False,
) -> Tuple[EnvState, StepResult, StepResult]:
    """Closed-loop rollout of ``n_steps`` env steps for ONE env.

    Returns (final_env_state, reset_result, stacked_step_results); vmap over
    (params/key/start_min) for a batch.  The controller acts on the previous
    step's result, exactly like the reference loop (sim_engine.py:33-37).

    ``pregen=True`` hoists the noise/meal streams out of the scan
    (:func:`pregen_env`) — same trajectories to within compiler-rounding
    ulps, substantially faster scan body; requires the native/random
    modes.  The returned final EnvState's sensor-lattice/scenario
    internals are frozen at their reset values (the exogenous planes
    replace them).
    """
    if pregen:
        cfg, params = pregen_env(cfg, params, key, n_steps, start_min)
    state, reset_res = env_reset(
        cfg, params, key, start_min=start_min, init_state=init_state
    )

    def body(carry, _):
        state, ctrl_state, prev_res = carry
        ctrl_state, action = ctrl_fn(ctrl_state, prev_res)
        state, res = env_step(cfg, params, state, action, reward_fun=reward_fun)
        return (state, ctrl_state, res), res

    (state, _, _), traj = jax.lax.scan(
        body, (state, ctrl_init, reset_res), None, length=n_steps
    )
    return state, reset_res, traj


def rollout_batch(
    cfg: EnvConfig,
    params: EnvParams,
    keys: jax.Array,
    ctrl_init: Any,
    ctrl_fn: ControllerFn,
    n_steps: int,
    start_min: jnp.ndarray = 0,
    reward_fun=risk_diff_reward,
    ctrl_in_axes=None,
    pregen: bool = False,
):
    """vmapped :func:`rollout` over a leading batch axis of params/keys.

    ``params`` leaves must carry the batch axis; ``start_min``/``ctrl_init``
    are broadcast if unbatched.  Pass ``ctrl_in_axes=0`` when the controller
    state is per-patient (e.g. batched BB therapy params).  Histories come
    back as [B, T] arrays.  ``pregen`` — see :func:`rollout`.
    """
    batched = jax.vmap(
        lambda p, k, sm, ci: rollout(
            cfg,
            p,
            k,
            ci,
            ctrl_fn,
            n_steps,
            start_min=sm,
            reward_fun=reward_fun,
            pregen=pregen,
        ),
        in_axes=(0, 0, 0, ctrl_in_axes),
    )
    B = keys.shape[0]
    start_min = jnp.broadcast_to(jnp.asarray(start_min, jnp.int32), (B,))
    return batched(params, keys, start_min, ctrl_init)


# ---------------------------------------------------------------------------
# Auto-reset batched env (RL path)
# ---------------------------------------------------------------------------


def autoreset_step(
    cfg: EnvConfig,
    params: EnvParams,
    state: EnvState,
    action,
    reward_fun=risk_diff_reward,
) -> Tuple[EnvState, StepResult, StepResult]:
    """One env step with gym-style auto-reset for a SINGLE env (vmap for a
    batch).

    When the step terminates, the env is re-initialized from a fresh key
    with a random start hour — the functional analog of the reference gym
    wrapper's brand-new-env-per-reset (simglucose_gym_env.py:48-51,66-67).

    Returns ``(state, res, carry_res)``:
      * ``res``       — the terminal StepResult of the step that just ran
                        (done=True and the terminal observation when the
                        episode ended; Gymnasium's ``final_observation``);
      * ``carry_res`` — what the NEXT policy invocation must see: equal to
                        ``res`` for live envs, and the new episode's *reset*
                        StepResult for terminated ones.  The reference gym
                        wrapper hands the reset observation to the agent
                        after done (simglucose_gym_env.py:48-51); feeding
                        ``carry_res`` forward reproduces that — the first
                        action of an episode is computed from the new
                        episode's CGM, never the previous terminal one.
    The returned ``state`` already belongs to the new episode where done.
    """
    state, res = env_step(cfg, params, state, action, reward_fun=reward_fun)

    new_key = jax.random.fold_in(state.key, state.patient.t)
    k_hour, k_reset = jax.random.split(new_key)
    hour = jax.random.randint(k_hour, (), 0, 24)
    fresh, fresh_res = env_reset(cfg, params, k_reset, start_min=hour * 60)

    def pick(a, b):
        return jnp.where(
            jnp.reshape(res.done, res.done.shape + (1,) * (a.ndim - res.done.ndim)),
            a,
            b,
        )

    reset_state = jax.tree.map(pick, fresh, state)
    carry_res = jax.tree.map(pick, fresh_res, res)
    return reset_state, res, carry_res


def make_batch_rollout_fn(
    cfg: EnvConfig,
    ctrl_fn: ControllerFn,
    n_steps: int,
    reward_fun=risk_diff_reward,
    donate: bool = True,
):
    """Compiled batched auto-reset rollout: (params[B], state[B], ctrl_state)
    -> (state[B], traj[T, B]).  The workhorse behind bench.py and the PPO
    actor.  State is donated so long runs reuse buffers."""

    step1 = partial(autoreset_step, cfg, reward_fun=reward_fun)

    def run(params, state: EnvState, ctrl_init, prev_res: StepResult):
        """``ctrl_init`` must be batched per env (use
        :func:`broadcast_ctrl_state` for shared scalar state)."""

        def body(carry, _):
            state, ctrl_state, prev = carry
            ctrl_state, action = jax.vmap(ctrl_fn)(ctrl_state, prev)
            state, res, carry_res = jax.vmap(step1)(params, state, action)
            # the controller's next invocation sees the reset observation
            # after a done (autoreset_step carry semantics); the trajectory
            # records the terminal result.
            return (state, ctrl_state, carry_res), res

        (state, ctrl_state, last), traj = jax.lax.scan(
            body, (state, ctrl_init, prev_res), None, length=n_steps
        )
        # state and last share values (e.g. .done) — without a barrier XLA
        # CSEs them into ONE output buffer, and feeding both back into the
        # next donated call trips "buffer was previously donated" (the
        # f(donate(a), a) hazard).  The barrier forces distinct buffers.
        state, last = jax.lax.optimization_barrier((state, last))
        return state, last, traj

    return jax.jit(run, donate_argnums=(1,) if donate else ())


def make_batch_continue_fn(
    cfg: EnvConfig,
    ctrl_fn: ControllerFn,
    n_steps: int,
    reward_fun=risk_diff_reward,
):
    """Compiled batched continuation WITHOUT auto-reset: steps existing
    episodes onward (the reference's SimObj loop keeps integrating past
    termination too, sim_engine.py:33-37).  Used for chunked rollouts —
    live animation, bounded-compile multi-day sims.

    ``ctrl_state`` must be batched per env (use :func:`broadcast_ctrl_state`
    for shared state).  Returns run(params[B], state[B], ctrl_state[B],
    prev_res[B]) -> (state, ctrl_state, last, traj[T, B]).
    """
    step1 = partial(env_step, cfg, reward_fun=reward_fun)

    def run(params, state: EnvState, ctrl_state, prev_res: StepResult):
        def body(carry, _):
            state, ctrl_state, prev = carry
            ctrl_state, action = jax.vmap(ctrl_fn)(ctrl_state, prev)
            state, res = jax.vmap(step1)(params, state, action)
            return (state, ctrl_state, res), res

        (state, ctrl_state, last), traj = jax.lax.scan(
            body, (state, ctrl_state, prev_res), None, length=n_steps
        )
        state, last = jax.lax.optimization_barrier((state, last))
        return state, ctrl_state, last, traj

    return jax.jit(run)


def broadcast_ctrl_state(ctrl_init, batch: int):
    """Tile a single-env controller state across a batch of ``batch`` envs."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (batch,) + jnp.shape(a)),
        ctrl_init,
    )


def batch_reset(cfg: EnvConfig, params: EnvParams, keys: jax.Array, start_min=None):
    """vmapped env_reset.  ``keys`` is [B]; params leaves carry [B]."""
    B = keys.shape[0]
    if start_min is None:
        hours = jax.vmap(lambda k: jax.random.randint(k, (), 0, 24))(
            jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys)
        )
        start_min = hours * 60
    else:
        start_min = jnp.broadcast_to(jnp.asarray(start_min, jnp.int32), (B,))
    state, res = jax.vmap(lambda p, k, sm: env_reset(cfg, p, k, start_min=sm))(
        params, keys, start_min
    )
    # Distinct buffers for state vs res (see make_batch_rollout_fn): the
    # reset state is typically fed to a donated rollout alongside res.
    return jax.lax.optimization_barrier((state, res))
