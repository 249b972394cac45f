"""Device-mesh sharding tests on the virtual 8-device CPU mesh.

The TPU analog of the reference's parallel==serial contract
(reference: tests/test_sim_engine.py:24-86): a cohort rollout sharded over
the mesh must equal the unsharded one.
"""
import jax
import numpy as np
import pytest

from simglucose_tpu.controllers.functional import pid_controller
from simglucose_tpu.envs.build import cohort_names, make_env
from simglucose_tpu.envs.rollout import (
    batch_reset,
    broadcast_ctrl_state,
    make_batch_rollout_fn,
)
from simglucose_tpu.parallel.sharding import (
    batch_sharding,
    gather_to_host,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh(dp=8, tp=1)


def _setup(B):
    cfg, params = make_env(cohort_names(B), batch=True, dtype=np.float32)
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=-1e-4)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, res = batch_reset(cfg, params, keys)
    return cfg, params, ctrl0, ctrl, state, res


def test_sharded_rollout_equals_unsharded(mesh):
    B, T = 16, 8
    cfg, params, ctrl0, ctrl, state, res = _setup(B)
    cs = broadcast_ctrl_state(ctrl0, B)
    run = make_batch_rollout_fn(cfg, ctrl, n_steps=T, donate=False)

    _, _, traj_ref = run(params, state, cs, res)

    params_s = shard_batch(params, mesh)
    state_s = shard_batch(state, mesh)
    res_s = shard_batch(res, mesh)
    cs_s = shard_batch(cs, mesh)
    _, _, traj_sh = run(params_s, state_s, cs_s, res_s)

    np.testing.assert_allclose(
        np.asarray(traj_ref.BG), np.asarray(traj_sh.BG), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(traj_ref.CGM), np.asarray(traj_sh.CGM), rtol=1e-6
    )


def test_sharding_placement(mesh):
    B = 16
    cfg, params, *_ = _setup(B)
    params_s = shard_batch(params, mesh)
    sh = params_s.patient.BW.sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), ndim=1)
    # each device holds B/8 patients
    assert params_s.patient.BW.addressable_shards[0].data.shape == (B // 8,)


def test_gather_to_host(mesh):
    B = 8
    cfg, params, *_ = _setup(B)
    params_s = shard_batch(params, mesh)
    host = gather_to_host(params_s)
    np.testing.assert_array_equal(
        host.patient.BW, np.asarray(params.patient.BW)
    )


def test_replicate(mesh):
    x = {"w": np.arange(6.0)}
    r = replicate(x, mesh)
    assert r["w"].sharding.is_fully_replicated
