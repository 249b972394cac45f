"""Rollout engine: determinism, vmap==single equivalence, auto-reset."""
import jax
import jax.numpy as jnp
import numpy as np

from simglucose_tpu.controllers.functional import (
    bb_controller,
    bb_params,
    pid_controller,
)
from simglucose_tpu.envs.build import cohort_names, make_env
from simglucose_tpu.envs.rollout import (
    batch_reset,
    broadcast_ctrl_state,
    make_batch_rollout_fn,
    rollout,
    rollout_batch,
)
from simglucose_tpu.params import load_quest_params

N = 40  # env steps per test rollout


def _bb(cfg, params, names):
    quest = load_quest_params(names, dtype=np.float64)
    quest = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), quest)
    bb = bb_params(params.patient, quest)
    return bb_controller(bb, cfg.sample_time)


def test_rollout_deterministic():
    cfg, params = make_env("adult#003", dtype=np.float64)
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=-1e-4, dtype=jnp.float64)
    run = jax.jit(lambda k: rollout(cfg, params, k, ctrl0, ctrl, N))
    _, _, t1 = run(jax.random.PRNGKey(5))
    _, _, t2 = run(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(t1.CGM), np.asarray(t2.CGM))
    _, _, t3 = run(jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(t1.CGM), np.asarray(t3.CGM))


def test_vmap_batch_equals_single_closed_loop():
    """TPU analog of the reference's parallel==serial test
    (tests/test_sim_engine.py:24-86): a vmapped cohort rollout must equal
    each patient's individual rollout exactly."""
    names = ["adolescent#002", "adult#007", "child#005"]
    cfg, params = make_env(names, dtype=np.float64, batch=True)
    quest = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64),
        load_quest_params(names, dtype=np.float64),
    )
    bb_all = bb_params(params.patient, quest)

    def one(p, bb, key):
        ctrl0, ctrl = bb_controller(bb, cfg.sample_time)
        return rollout(cfg, p, key, ctrl0, ctrl, N, start_min=jnp.int32(360))

    keys = jax.random.split(jax.random.PRNGKey(0), len(names))
    _, _, traj_b = jax.jit(jax.vmap(one))(params, bb_all, keys)

    for i in range(len(names)):
        p_i = jax.tree.map(lambda a: a[i], params)
        bb_i = jax.tree.map(lambda a: a[i], bb_all)
        _, _, traj_i = jax.jit(one)(p_i, bb_i, keys[i])
        for field in ("BG", "CGM", "CHO", "insulin"):
            np.testing.assert_array_equal(
                np.asarray(getattr(traj_b, field)[i]),
                np.asarray(getattr(traj_i, field)),
                err_msg=f"{names[i]}:{field}",
            )
        # the derived reward goes through log/power, which XLA fuses
        # differently under vmap — 1-ulp contract there
        np.testing.assert_allclose(
            np.asarray(traj_b.reward[i]),
            np.asarray(traj_i.reward),
            rtol=0,
            atol=1e-14,
            err_msg=f"{names[i]}:reward",
        )


def test_autoreset_batch_rollout():
    """Batched auto-reset engine: runs a cohort with a hypo-inducing PID
    controller; terminated episodes restart (episode_step drops back)."""
    names = cohort_names(8)
    cfg, params = make_env(names, dtype=np.float64, batch=True, random_init_bg=True)
    # aggressive positive basal on high glucose -> eventually done flags
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=0.05, dtype=jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    state, reset_res = batch_reset(cfg, params, keys)
    run = make_batch_rollout_fn(cfg, ctrl, n_steps=300, donate=False)
    final, last, traj = run(params, state, broadcast_ctrl_state(ctrl0, 8), reset_res)
    done = np.asarray(traj.done)
    assert done.any(), "expected at least one termination in 300 steps"
    # after a done, the env state belongs to a fresh episode
    steps = np.asarray(final.episode_step)
    assert steps.max() <= 300
    # BG stays finite and positive through resets
    assert np.isfinite(np.asarray(traj.BG)).all()
    assert (np.asarray(traj.BG) > 0).all()


def test_random_init_bg_varies():
    cfg, params = make_env(
        ["adolescent#001"] * 4, dtype=np.float64, batch=True, random_init_bg=True
    )
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    state, reset_res = batch_reset(cfg, params, keys, start_min=0)
    bg0 = np.asarray(reset_res.BG)
    assert len(np.unique(bg0)) == 4  # all different initial BG
