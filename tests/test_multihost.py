"""Multi-host helpers on a single process (8 virtual devices)."""
import jax
import numpy as np

from simglucose_tpu.controllers.functional import constant_controller
from simglucose_tpu.envs.build import cohort_names, make_env
from simglucose_tpu.envs.rollout import (
    batch_reset,
    broadcast_ctrl_state,
    make_batch_continue_fn,
    make_batch_rollout_fn,
)
from simglucose_tpu.parallel.multihost import local_batch_slice, local_shard
from simglucose_tpu.parallel.sharding import make_mesh, shard_batch


def test_local_batch_slice_single_process():
    assert local_batch_slice(16) == slice(0, 16)


def test_local_shard_pulls_sharded_batch_axis():
    mesh = make_mesh(dp=8, tp=1)
    B = 16
    cfg, params = make_env(cohort_names(B), batch=True, dtype=np.float32)
    params_s = shard_batch(params, mesh)
    host = local_shard(params_s)
    np.testing.assert_array_equal(
        host.patient.BW, np.asarray(params.patient.BW)
    )


def test_local_shard_axis1_sharded_traj():
    """traj arrays are [T, B] with B (axis 1) sharded."""
    mesh = make_mesh(dp=8, tp=1)
    B, T = 16, 4
    cfg, params = make_env(cohort_names(B), batch=True, dtype=np.float32)
    ctrl0, ctrl = constant_controller(0.01)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, res = batch_reset(cfg, params, keys)
    run = make_batch_rollout_fn(cfg, ctrl, n_steps=T, donate=False)
    params_s = shard_batch(params, mesh)
    state_s = shard_batch(state, mesh)
    res_s = shard_batch(res, mesh)
    cs = broadcast_ctrl_state(ctrl0, B)
    _, _, traj = run(params_s, state_s, shard_batch(cs, mesh), res_s)
    host = local_shard(traj)
    assert host.BG.shape == (T, B)
    assert np.isfinite(host.BG).all()


def test_continue_fn_matches_rollout():
    """Two chained continue chunks == one long rollout (no auto-reset)."""
    B, T = 8, 12
    cfg, params = make_env(cohort_names(B), batch=True, dtype=np.float32)
    ctrl0, ctrl = constant_controller(0.01)
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    state, res = batch_reset(cfg, params, keys, start_min=360)
    cs = broadcast_ctrl_state(ctrl0, B)

    run_full = make_batch_continue_fn(cfg, ctrl, T)
    _, _, _, traj_full = run_full(params, state, cs, res)

    run_half = make_batch_continue_fn(cfg, ctrl, T // 2)
    s1, cs1, last1, tr1 = run_half(params, state, cs, res)
    _, _, _, tr2 = run_half(params, s1, cs1, last1)
    chained = np.concatenate([np.asarray(tr1.BG), np.asarray(tr2.BG)], axis=0)
    np.testing.assert_array_equal(chained, np.asarray(traj_full.BG))
