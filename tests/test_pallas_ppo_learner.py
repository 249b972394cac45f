"""Fused PPO grad-step kernel vs jax.grad of the XLA loss.

The kernel (ops/pallas_ppo_learner.py) hand-derives the backward of
rl/ppo._ppo_loss; these tests pin gradient and loss-aux parity against
autodiff at f32 compute (interpret mode on the CPU mesh), for both trunk
activations and across grid-tile accumulation.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simglucose_tpu.ops.pallas_ppo_learner import (
    pack_minibatch_rows,
    ppo_grad_step,
)
from simglucose_tpu.rl.policy import init_policy
from simglucose_tpu.rl.ppo import PPOConfig, _ppo_loss


def _data(key, mb, scale=1.0):
    ks = jax.random.split(key, 5)
    obs = jax.random.normal(ks[0], (mb, 7), jnp.float32)
    raw = jax.random.normal(ks[1], (mb,), jnp.float32) * scale
    # logp_old near the current logp so ratios straddle the clip boundary
    logp = jax.random.normal(ks[2], (mb,), jnp.float32) * 0.3 - 1.2
    adv = jax.random.normal(ks[3], (mb,), jnp.float32)
    ret = jax.random.normal(ks[4], (mb,), jnp.float32)
    return obs, raw, logp, adv, ret


@pytest.mark.parametrize("act", ["relu", "tanh"])
@pytest.mark.parametrize("tiles", [1, 4])
def test_grad_parity_vs_autodiff(act, tiles):
    cfg = PPOConfig(clip_eps=0.2, vf_coef=0.5, ent_coef=1e-3)
    mb, H = 512, 16
    params = init_policy(jax.random.PRNGKey(0), hidden=H, act=act)
    obs, raw, logp, adv, ret = _data(jax.random.PRNGKey(1), mb)

    batch = (obs, raw, logp, adv, ret)
    (loss, aux), g = jax.value_and_grad(
        lambda p: _ppo_loss(cfg, p, batch, None), has_aux=True
    )(params)

    out = ppo_grad_step(
        pack_minibatch_rows(obs, raw, logp, adv, ret),
        params.w1, params.b1, params.w2, params.b2,
        jnp.concatenate([params.w_mu, params.w_v], axis=1),
        jnp.concatenate([params.b_mu, params.b_v]),
        params.log_std[0],
        jnp.mean(adv), jnp.std(adv),
        act=act, clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        row_tile=mb // tiles, compute_dtype=jnp.float32, interpret=True,
    )

    tol = dict(rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(out.dw1, g.w1, **tol)
    np.testing.assert_allclose(out.db1, g.b1, **tol)
    np.testing.assert_allclose(out.dw2, g.w2, **tol)
    np.testing.assert_allclose(out.db2, g.b2, **tol)
    np.testing.assert_allclose(out.dw_head[:, 0:1], g.w_mu, **tol)
    np.testing.assert_allclose(out.dw_head[:, 1:2], g.w_v, **tol)
    np.testing.assert_allclose(out.db_head[0:1], g.b_mu, **tol)
    np.testing.assert_allclose(out.db_head[1:2], g.b_v, **tol)
    # kernel excludes the entropy term (-ent_coef, added by the caller)
    np.testing.assert_allclose(
        np.asarray(out.dlog_std) - cfg.ent_coef, g.log_std[0], **tol
    )
    pg_loss, v_loss, entropy = aux
    np.testing.assert_allclose(out.pg_sum / mb, pg_loss, **tol)
    np.testing.assert_allclose(out.v_sum / mb, v_loss, **tol)


def test_clip_boundary_gradients():
    """Rows far outside the clip band must contribute ZERO policy gradient
    when the clipped branch is active (adv>0, ratio>>1+eps) and the full
    gradient when the unclipped branch wins (adv<0)."""
    cfg = PPOConfig(clip_eps=0.2)
    mb, H = 256, 16
    params = init_policy(jax.random.PRNGKey(3), hidden=H, act="relu")
    obs, raw, logp, adv, ret = _data(jax.random.PRNGKey(4), mb)
    # push every ratio far above 1+eps
    logp = logp - 5.0
    batch = (obs, raw, logp, adv, ret)
    _, g = jax.value_and_grad(
        lambda p: _ppo_loss(cfg, p, batch, None), has_aux=True
    )(params)
    out = ppo_grad_step(
        pack_minibatch_rows(obs, raw, logp, adv, ret),
        params.w1, params.b1, params.w2, params.b2,
        jnp.concatenate([params.w_mu, params.w_v], axis=1),
        jnp.concatenate([params.b_mu, params.b_v]),
        params.log_std[0],
        jnp.mean(adv), jnp.std(adv),
        act="relu", clip_eps=cfg.clip_eps, vf_coef=cfg.vf_coef,
        row_tile=mb, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(out.dw_head[:, 0:1], g.w_mu, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(out.dw1, g.w1, rtol=2e-4, atol=1e-6)


def test_update_pallas_matches_xla_learner():
    """Full _update (2 epochs x 2 minibatches of adam steps) with the
    pallas grad kernel must track the XLA autodiff learner: same shuffle
    key -> same minibatches -> near-identical updated params."""
    from simglucose_tpu.rl.ppo import Transition, _update, make_optimizer

    T, B, H = 8, 64, 16
    N = T * B
    cfg = PPOConfig(epochs=2, minibatches=2)
    cfg_p = dataclasses.replace(cfg, pallas_learner=True)
    params = init_policy(jax.random.PRNGKey(0), hidden=H, act="relu")
    obs, raw, logp, adv, ret = _data(jax.random.PRNGKey(1), N)
    key = jax.random.PRNGKey(2)

    # value/done shapes [T, B]
    tr = Transition(
        obs=obs.reshape(T, B, 7),
        raw_action=raw.reshape(T, B),
        logp=logp.reshape(T, B),
        value=ret.reshape(T, B) * 0.1,
        reward=adv.reshape(T, B),
        done=jnp.zeros((T, B), bool),
    )
    advs = adv.reshape(T, B)
    rets = ret.reshape(T, B)

    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    p_x, _, _, aux_x = _update(
        cfg, opt, params, opt_state, tr, advs, rets, key, mesh=None
    )
    p_p, _, _, aux_p = _update(
        cfg_p, opt, params, opt_state, tr, advs, rets, key, mesh=None,
        interpret=True,
    )
    for a, b in zip(jax.tree.leaves(p_x), jax.tree.leaves(p_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5
        )
    # loss aux parity (pg_loss, v_loss) across the scanned steps
    np.testing.assert_allclose(
        np.asarray(aux_x[0]), np.asarray(aux_p[0]), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux_x[1]), np.asarray(aux_p[1]), rtol=1e-3, atol=1e-5
    )


def test_update_epoch_kernel_matches_xla_learner():
    """The WHOLE-learner kernel (pallas_learner='epoch': all epochs,
    minibatches, clip, and in-kernel adam) must track the XLA autodiff
    learner through a full 2-epoch x 2-minibatch update — same key chain,
    same shuffle, near-identical params, opt state, and loss aux."""
    import optax

    from simglucose_tpu.rl.ppo import (
        Transition,
        _find_adam_state,
        _update,
        make_optimizer,
    )

    T, B, H = 8, 64, 16
    N = T * B
    cfg = PPOConfig(epochs=2, minibatches=2)
    cfg_e = dataclasses.replace(cfg, pallas_learner="epoch")
    params = init_policy(jax.random.PRNGKey(0), hidden=H, act="relu")
    obs, raw, logp, adv, ret = _data(jax.random.PRNGKey(1), N)
    key = jax.random.PRNGKey(2)

    tr = Transition(
        obs=obs.reshape(T, B, 7),
        raw_action=raw.reshape(T, B),
        logp=logp.reshape(T, B),
        value=ret.reshape(T, B) * 0.1,
        reward=adv.reshape(T, B),
        done=jnp.zeros((T, B), bool),
    )
    advs = adv.reshape(T, B)
    rets = ret.reshape(T, B)

    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    p_x, os_x, key_x, aux_x = _update(
        cfg, opt, params, opt_state, tr, advs, rets, key, mesh=None
    )
    p_e, os_e, key_e, aux_e = _update(
        cfg_e, opt, params, opt_state, tr, advs, rets, key, mesh=None,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(key_x), np.asarray(key_e))
    for a, b in zip(jax.tree.leaves(p_x), jax.tree.leaves(p_e)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=3e-5
        )
    ad_x = _find_adam_state(os_x)
    ad_e = _find_adam_state(os_e)
    assert int(ad_e.count) == int(ad_x.count) == cfg.epochs * cfg.minibatches
    np.testing.assert_allclose(
        np.asarray(ad_x.mu), np.asarray(ad_e.mu), rtol=5e-3, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(ad_x.nu), np.asarray(ad_e.nu), rtol=5e-3, atol=1e-7
    )
    # loss aux parity (pg_loss, v_loss, entropy), [E, MB] each
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(aux_x[i]), np.asarray(aux_e[i]), rtol=2e-3, atol=1e-4
        )


def test_gather2_matches_gather12():
    """The two-buffer grad-step kernel (ppo_grad_step_gather2: the rollout
    kernel's [10, N] learner buffer + a [2, N] adv/ret companion, shared
    block index map) must produce exactly the gradients of the 12-row
    single-buffer gather kernel on the same rows.  Row 7 carries the VALUE
    plane in the two-buffer layout — the forward must null it via the
    zero-padded w1 column."""
    from simglucose_tpu.ops.pallas_ppo_learner import (
        ppo_grad_step_gather,
        ppo_grad_step_gather2,
    )
    from simglucose_tpu.rl.policy import gaussian_logprob, policy_apply

    H, N, bs = 16, 512, 2
    p = init_policy(jax.random.PRNGKey(0), hidden=H, act="relu")
    obs, raw, _, adv, ret = _data(jax.random.PRNGKey(1), N)
    mu, ls, v = policy_apply(p, obs)
    logp = gaussian_logprob(mu, ls, raw)

    packed12 = pack_minibatch_rows(obs, raw, logp, adv, ret)
    main10 = jnp.concatenate(
        [obs.T, v.reshape(1, N), raw.reshape(1, N), logp.reshape(1, N)],
        axis=0,
    )
    advret = jnp.stack([adv, ret])
    # an arbitrary half-the-blocks minibatch, out of order
    perm = jnp.asarray(
        np.random.default_rng(3).permutation(N // bs)[: (N // bs) // 2],
        jnp.int32,
    )
    w_head = jnp.concatenate([p.w_mu, p.w_v], axis=1)
    b_head = jnp.concatenate([p.b_mu, p.b_v])
    am, asd = adv.mean(), adv.std()
    kw = dict(act="relu", compute_dtype=jnp.float32, interpret=True)
    out1 = ppo_grad_step_gather(
        packed12, perm, bs, p.w1, p.b1, p.w2, p.b2, w_head, b_head,
        p.log_std[0], am, asd, **kw,
    )
    out2 = ppo_grad_step_gather2(
        main10, advret, perm, bs, p.w1, p.b1, p.w2, p.b2, w_head, b_head,
        p.log_std[0], am, asd, **kw,
    )
    for f in out1._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out1, f)), np.asarray(getattr(out2, f)),
            rtol=1e-6, atol=1e-7, err_msg=f,
        )


def test_update_pallas_dp_mesh_matches_single_device():
    """The data-parallel kernel learner (_update_pallas_dp: per-device
    grad kernels inside shard_map + one psum per minibatch) must equal
    the single-device kernel learner when the minibatch is the full batch
    (epochs=1, minibatches=1 — no shuffle-partition difference), and its
    params must come back replicated-identical across the mesh."""
    from simglucose_tpu.parallel.sharding import make_mesh, shard_batch
    from simglucose_tpu.rl.ppo import Transition, _update, make_optimizer

    T, B, H = 2, 512, 16
    N = T * B
    cfg = PPOConfig(epochs=1, minibatches=1, pallas_learner="step")
    params = init_policy(jax.random.PRNGKey(0), hidden=H, act="relu")
    obs, raw, logp, adv, ret = _data(jax.random.PRNGKey(1), N)
    key = jax.random.PRNGKey(2)
    tr = Transition(
        obs=obs.reshape(T, B, 7),
        raw_action=raw.reshape(T, B),
        logp=logp.reshape(T, B),
        value=ret.reshape(T, B) * 0.1,
        reward=adv.reshape(T, B),
        done=jnp.zeros((T, B), bool),
    )
    advs = adv.reshape(T, B)
    rets = ret.reshape(T, B)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    p_1, _, _, aux_1 = _update(
        cfg, opt, params, opt_state, tr, advs, rets, key, mesh=None,
        interpret=True,
    )

    mesh = make_mesh(dp=8, tp=1)
    tr_s = Transition(
        obs=shard_batch(tr.obs.swapaxes(0, 1), mesh).swapaxes(0, 1),
        raw_action=tr.raw_action,
        logp=tr.logp,
        value=tr.value,
        reward=tr.reward,
        done=tr.done,
    )
    p_8, _, _, aux_8 = _update(
        cfg, opt, params, opt_state, tr_s, advs, rets, key, mesh=mesh,
        interpret=True,
    )
    for a, b in zip(jax.tree.leaves(p_1), jax.tree.leaves(p_8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(aux_1[0]), np.asarray(aux_8[0]), rtol=1e-4, atol=1e-6
    )

    # multi-minibatch dp run: finite, params move, still replicated
    cfg2 = PPOConfig(epochs=2, minibatches=2, pallas_learner="step")
    p_m, _, _, aux_m = _update(
        cfg2, opt, params, opt_state, tr, advs, rets, key, mesh=mesh,
        interpret=True,
    )
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p_m))
    assert not np.allclose(np.asarray(p_m.w1), np.asarray(params.w1))


def test_gae_pack_matches_xla_gae():
    """The fused GAE+pack kernel (gae_pack) must reproduce rl/ppo._gae +
    stack to f32 rounding (the XLA path uses an associative scan, which
    reassociates the recurrence)."""
    from simglucose_tpu.ops.pallas_ppo_learner import gae_pack
    from simglucose_tpu.rl.ppo import Transition, _gae

    T, B = 8, 256
    cfg = PPOConfig(gamma=0.99, lam=0.95)
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    reward = jax.random.normal(k[0], (T, B), jnp.float32)
    value = jax.random.normal(k[1], (T, B), jnp.float32)
    done = (jax.random.uniform(k[2], (T, B)) < 0.15).astype(jnp.float32)
    tail = jax.random.normal(k[3], (B,), jnp.float32)

    tr = Transition(obs=value, raw_action=value, logp=value,
                    value=value, reward=reward, done=done)
    advs, rets = _gae(cfg, tr, tail)
    ref = jnp.stack([advs.reshape(-1), rets.reshape(-1)])

    got = gae_pack(reward, done, value, tail, gamma=cfg.gamma,
                   lam=cfg.lam, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-5
    )
