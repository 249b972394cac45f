"""PPO actor-learner smoke tests (single-program training iteration)."""
import jax
import numpy as np

from simglucose_tpu.envs.build import cohort_names, make_env
from simglucose_tpu.envs.rollout import batch_reset
from simglucose_tpu.parallel.sharding import make_mesh, replicate, shard_batch
from simglucose_tpu.rl.policy import featurize, init_policy, sample_action
from simglucose_tpu.rl.ppo import (
    PPOConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)


def _setup(B, rollout_steps=4):
    cfg, env_params = make_env(
        cohort_names(B), batch=True, random_init_bg=True, dtype=np.float32
    )
    key = jax.random.PRNGKey(0)
    env_state, reset_res = batch_reset(cfg, env_params, jax.random.split(key, B))
    ppo_cfg = PPOConfig(rollout_steps=rollout_steps, epochs=1, minibatches=2)
    policy = init_policy(jax.random.fold_in(key, 1), hidden=32)
    opt_state = make_optimizer(ppo_cfg).init(policy)
    ts = TrainState(
        params=policy,
        opt_state=opt_state,
        env_state=env_state,
        prev_res=reset_res,
        key=key,
    )
    return cfg, env_params, ppo_cfg, ts


def test_policy_sample_shapes():
    B = 8
    cfg, env_params, ppo_cfg, ts = _setup(B)
    obs = featurize(ts.prev_res)
    basal, raw, logp, value = sample_action(
        ts.params, obs, jax.random.PRNGKey(2)
    )
    assert basal.shape == (B,)
    assert np.all(np.asarray(basal) >= 0)
    assert logp.shape == (B,) and value.shape == (B,)


def test_train_step_updates_params_and_is_finite():
    B = 8
    cfg, env_params, ppo_cfg, ts = _setup(B)
    train_step = jax.jit(make_train_step(ppo_cfg, cfg))
    ts2, metrics = train_step(env_params, ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params changed
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params))
    )
    assert changed
    # a second step composes
    ts3, metrics3 = train_step(env_params, ts2)
    assert np.isfinite(float(metrics3["reward_mean"]))


def test_ppo_learns_glucose_control():
    """PPO must demonstrably LEARN, not just update: over 500 seeded
    iterations (B=64, ~1M env steps) the mean risk-diff reward and the
    episode termination rate must both improve substantially, and the
    learned mean basal must land in the therapeutic range.  The analog of
    the reference's end-to-end DDPG training test
    (reference: tests/test_rllab.py:13-52), with an actual improvement
    assertion instead of a smoke run."""
    B = 64
    cfg, env_params = make_env(
        cohort_names(B), batch=True, random_init_bg=True, dtype=np.float32
    )
    key = jax.random.PRNGKey(0)
    env_state, reset_res = batch_reset(
        cfg, env_params, jax.random.split(key, B)
    )
    ppo_cfg = PPOConfig(rollout_steps=32, epochs=4, minibatches=2, lr=3e-3)
    policy = init_policy(
        jax.random.fold_in(key, 1), hidden=64,
        init_log_std=ppo_cfg.init_log_std,
    )
    ts = TrainState(
        params=policy,
        opt_state=make_optimizer(ppo_cfg).init(policy),
        env_state=env_state,
        prev_res=reset_res,
        key=key,
    )
    step = jax.jit(make_train_step(ppo_cfg, cfg))
    rewards, dones = [], []
    for _ in range(500):
        ts, m = step(env_params, ts)
        rewards.append(float(m["reward_mean"]))
        dones.append(float(m["done_frac"]))

    r_start, r_end = np.mean(rewards[:20]), np.mean(rewards[-50:])
    d_start, d_end = np.mean(dones[:20]), np.mean(dones[-50:])
    # measured on this seed (x64 CI config): reward -0.133 -> -0.078,
    # done 0.0182 -> 0.0096, learned basal 0.040 U/min
    assert r_end > r_start * 0.8, (r_start, r_end)  # >=20% less negative
    assert d_end < d_start * 0.7, (d_start, d_end)  # >=30% fewer deaths

    # the learned deterministic policy emits therapeutic basal rates
    from simglucose_tpu.rl.policy import policy_apply

    mu, _, _ = policy_apply(ts.params, featurize(ts.prev_res))
    basal = np.asarray(jax.nn.sigmoid(mu)) * ppo_cfg.action_scale
    assert 0.005 < basal.mean() < 0.09, basal.mean()


def test_train_step_sharded_matches_unsharded():
    B = 16
    cfg, env_params, ppo_cfg, ts = _setup(B)
    train_step = jax.jit(make_train_step(ppo_cfg, cfg))
    _, m_ref = train_step(env_params, ts)

    mesh = make_mesh(dp=8, tp=1)
    env_params_s = shard_batch(env_params, mesh)
    ts_s = TrainState(
        params=replicate(ts.params, mesh),
        opt_state=replicate(ts.opt_state, mesh),
        env_state=shard_batch(ts.env_state, mesh),
        prev_res=shard_batch(ts.prev_res, mesh),
        key=replicate(ts.key, mesh),
    )
    train_step_s = jax.jit(make_train_step(ppo_cfg, cfg, mesh=mesh))
    with mesh:
        _, m_sh = train_step_s(env_params_s, ts_s)
    np.testing.assert_allclose(
        float(m_ref["reward_mean"]), float(m_sh["reward_mean"]), rtol=1e-4
    )
