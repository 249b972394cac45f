"""Pallas-fused PPO: the actor rollout (env physics + policy MLP + action
sampling) runs as ONE in-VMEM TPU kernel; the learner stays in XLA.

The XLA-scan rollout of :func:`simglucose_tpu.rl.ppo.make_train_step` tops
out ~24M env-steps/s (per-step fusion boundaries); the pallas kernel runs
the same closed loop >1B steps/s.  This module routes PPO's rollout through
the kernel's 'nn' controller (ops/pallas_rollout.py): the policy trunk runs
on the MXU inside the kernel, and the kernel emits — besides the usual
trajectory planes — the raw pre-squash actions and the controller's
observation inputs (octrl/oins/ocho).  The learner reconstructs
``featurize()`` from those planes and recomputes log-probs and values in
one batched XLA forward pass (cheap: two matmuls over [T*B, 4]), then runs
the exact same ``_update`` (GAE + epochs of clipped-surrogate minibatches)
as the XLA-rollout trainer.

Episode state persists ACROSS training iterations (the kernel's
``persistent_state`` mode streams the full simulator state in/out), so
episodes are not truncated at rollout_steps — same semantics as the XLA
trainer's env-state carry.

This is BASELINE config 4 (on-device actor-learner over 8192 patients) at
kernel speed; the reference analog is rllab DDPG training over the gym env
(reference: examples/run_rllab.py:1-43, tests/test_rllab.py:13-52).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from simglucose_tpu.ops.pallas_rollout import (
    NS_F,
    NS_I,
    LANES,
    PallasRolloutConfig,
    make_pallas_rollout,
    make_sharded_pallas_rollout,
    pack_policy_weights,
    packed_basal,
)
from simglucose_tpu.rl.policy import (
    PolicyParams,
    featurize_parts,
    gaussian_logprob,
    policy_apply,
)
from simglucose_tpu.rl.ppo import PPOConfig, Transition, _gae, _update, \
    _update_packed, make_optimizer


class FusedTrainState(NamedTuple):
    params: PolicyParams
    opt_state: optax.OptState
    state_f: jnp.ndarray  # kernel simulator state, [NS_F, rows, 128] f32
    state_i: jnp.ndarray  # [NS_I, rows, 128] i32
    init: jnp.ndarray  # i32 scalar: 1 before the first rollout
    key: jax.Array


def init_fused_state(
    params: PolicyParams,
    opt_state,
    batch: int,
    key: jax.Array,
    mesh=None,
    axis: str = "dp",
) -> FusedTrainState:
    rows = batch // LANES
    state_f = jnp.zeros((NS_F, rows, LANES), jnp.float32)
    state_i = jnp.zeros((NS_I, rows, LANES), jnp.int32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(None, axis, None))
        rep = NamedSharding(mesh, P())
        state_f = jax.device_put(state_f, shard)
        state_i = jax.device_put(state_i, shard)
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
    return FusedTrainState(
        params=params,
        opt_state=opt_state,
        state_f=state_f,
        state_i=state_i,
        init=jnp.int32(1),
        key=key,
    )


def _features(octrl, oins, ocho, oprev, oiob, basal):
    """featurize() from the kernel's observation planes (``basal`` [B] is
    static per patient and broadcasts over the time axis)."""
    return featurize_parts(octrl, oins, ocho, oprev, oiob, basal)


def make_fused_train_step(
    cfg: PPOConfig,
    batch: int,
    sensor: str = "Dexcom",
    hidden: int = 64,
    interpret: bool = False,
    pallas_overrides: Optional[dict] = None,
    mesh=None,
    axis: str = "dp",
    reward_kind: str = "risk_diff",
    continuing: bool = False,
    reward_fn=None,
    stages: str = "full",
    kernel_prep: Optional[bool] = None,
):
    """Build the fused PPO iteration: pallas actor + XLA learner.

    Returns ``train_step(packed_params, ts) -> (ts', metrics)`` where
    ``packed_params`` comes from :func:`ops.pallas_rollout.pack_params` and
    ``ts`` is a :class:`FusedTrainState` (see :func:`init_fused_state`).
    The policy MUST carry the relu trunk (``init_policy(..., act='relu')``)
    with width ``hidden`` — the kernel runs that exact network, and
    ``pack_policy_weights`` rejects params whose static ``act`` metadata
    says otherwise (a tanh-trained checkpoint cannot silently run as relu).

    With ``mesh``, the kernel fans out one-per-device over the mesh's
    ``axis`` (patients sharded, weights replicated) and the learner's
    gradient all-reduce over the sharded minibatches is inserted by GSPMD —
    the multi-chip training configuration (BASELINE config 5).

    ``continuing=True`` trains the CONTINUING-task objective: auto-reset is
    off (a BG excursion is not an exit — the patient stays in the bad state
    and keeps collecting its reward, exactly like the fixed-horizon
    clinical evaluation protocol, reference sim_engine.py:29-39), and GAE
    sees no terminals.  This closes the train/eval mismatch that makes
    episodic auto-reset training exploitable: with dense negative rewards,
    dying respawns the patient at a healthy BG, so a policy can farm resets
    (measured: overdose -> 92% hypo time while the TRAIN reward improves).
    Thread fresh episodes periodically by setting ``ts.init = 1`` between
    dispatch blocks (tools/train_ppo_tpu.py re-inits every ~25 simulated
    hours).

    ``reward_fn(traj) -> [T, B] reward`` recomputes the training reward in
    XLA from the kernel's trajectory planes (CGM/BG/CHO/insulin/done),
    overriding the kernel's built-in ``reward_kind`` — arbitrary shaped
    training objectives (e.g. hypo-weighted risk) without kernel changes.
    The reference's pluggable ``reward_fun`` (simulation/env.py:100-102)
    at trainer scope; costs one fused elementwise pass over [T, B].

    ``stages`` truncates the iteration for device-time profiling
    (tools/profile_fused_ppo.py): 'rollout' = kernel + state carry only;
    'forward' = + GAE (kernel-prep) or + featurize / logp-value forwards /
    GAE (plane prep), no update; 'full' (default) = the real training
    step.  Non-'full' stages keep params/opt_state unchanged.

    ``kernel_prep`` — emit the learner's feature-major buffer DIRECTLY
    from the rollout kernel (``nn_emit_learner_rows``: obs rows + value +
    raw + logp computed in-kernel, bootstrap value included) and feed the
    fused grad-step kernel straight from it — the entire XLA prep stage
    (featurize + forwards + pack) disappears; only GAE (a [T, B]
    associative scan) and the [2, N] adv/ret pack remain between the two
    kernels (VERDICT r4 item 1).  Defaults to True exactly when eligible:
    single device (no mesh) with ``cfg.pallas_learner`` in (True, 'step').
    The mesh trainer and the 'epoch' learner keep the observation-plane
    path.
    """
    if stages not in ("rollout", "forward", "full"):
        raise ValueError(f"stages must be rollout|forward|full; got {stages!r}")
    from simglucose_tpu.ops.pallas_rollout import config_for_sensor

    # learner_bf16 is excluded: the kernel-prep buffer carries f32
    # logp/value from the rollout kernel while a bf16 learner forward
    # would recompute them in bf16 — the epoch-0 ratio==1 invariant (the
    # plane path shares ONE compute_dtype between the recompute and the
    # loss forward) would silently break.  bf16 measured no learner
    # speedup anyway (BASELINE.md round-4).
    prep_eligible = (
        mesh is None
        and cfg.pallas_learner in (True, "step")
        and not cfg.learner_bf16
    )
    if kernel_prep is None:
        kernel_prep = prep_eligible
    elif kernel_prep and not prep_eligible:
        raise ValueError(
            "kernel_prep=True needs the single-device pallas 'step' "
            "learner (mesh=None, PPOConfig.pallas_learner in (True, "
            "'step')) with an f32 learner (learner_bf16=False — the "
            "in-kernel behavior logp/value are f32, and a bf16 loss "
            "forward would break the epoch-0 ratio==1 law); the mesh "
            "trainer and the 'epoch' learner use the observation-plane "
            "prep"
        )

    over = dict(
        controller="nn",
        nn_hidden=hidden,
        nn_action_scale=cfg.action_scale,
        nn_scale_by_basal=cfg.scale_by_basal,
        nn_decoder=cfg.decoder,
        n_steps=cfg.rollout_steps,
        persistent_state=True,
        prng="hw" if not interpret else "sw",
        reward_kind=reward_kind,
        autoreset=not continuing,
        nn_emit_learner_rows=kernel_prep,
        # the nn config carries 10 trajectory planes + state in/out in
        # VMEM; the default t_chunk=32 lands ~30KB over the 16MB budget
        # (and the emit-mode learner buffer adds another ~40% of block
        # VMEM — cap its chunk at 8).  Must divide rollout_steps: pick the
        # largest divisor <= the cap.
        t_chunk=max(
            c
            for c in range(
                1, min(8 if kernel_prep else 16, cfg.rollout_steps) + 1
            )
            if cfg.rollout_steps % c == 0
        ),
    )
    over.update(pallas_overrides or {})
    pcfg: PallasRolloutConfig = config_for_sensor(sensor, **over)
    if mesh is None:
        run = make_pallas_rollout(pcfg, batch, interpret=interpret)
    else:
        run = make_sharded_pallas_rollout(
            pcfg, batch, mesh, axis=axis, interpret=interpret
        )
    opt = make_optimizer(cfg)

    def train_step(packed_params: jnp.ndarray, ts: FusedTrainState):
        from simglucose_tpu.rl.policy import check_action_decoder

        check_action_decoder(
            ts.params, cfg.action_scale, cfg.scale_by_basal,
            "make_fused_train_step", decoder=cfg.decoder,
        )
        key, k_seed = jax.random.split(ts.key)
        seed = jax.random.randint(k_seed, (), 0, 2**31 - 1, jnp.int32)
        traj = run(
            packed_params,
            seed,
            weights=pack_policy_weights(ts.params),
            state=(ts.state_f, ts.state_i),
            init=ts.init,
        )
        if stages == "rollout":
            state_f, state_i = jax.lax.optimization_barrier(
                (traj["state_f"], traj["state_i"])
            )
            metrics = {
                "reward_mean": traj["reward"].mean(),
                "done_frac": traj["done"].mean(),
            }
            return ts._replace(
                state_f=state_f, state_i=state_i, init=jnp.int32(0), key=key
            ), metrics
        if kernel_prep:
            # the rollout kernel already emitted the learner buffer (obs
            # rows + value + raw + logp) AND the bootstrap value — GAE +
            # the [2, N] adv/ret pack run as one more small kernel
            # (ops/pallas_ppo_learner.gae_pack), leaving only the reward
            # shaping (penalty / reward_fn) in XLA
            from simglucose_tpu.ops.pallas_ppo_learner import gae_pack

            value = traj["value"]  # [T, B]
            done = traj["done"]
            base_reward = (
                traj["reward"] if reward_fn is None else reward_fn(traj)
            )
            reward = base_reward - cfg.done_penalty * done.astype(value.dtype)
            gae_done = (
                jnp.zeros_like(value)
                if continuing else done.astype(value.dtype)
            )
            advret = gae_pack(
                reward, gae_done, value, traj["tail_value"],
                gamma=cfg.gamma, lam=cfg.lam, interpret=interpret,
            )  # [2, N]
            state_f, state_i = jax.lax.optimization_barrier(
                (traj["state_f"], traj["state_i"])
            )
            if stages == "forward":
                metrics = {
                    "reward_mean": reward.mean(),
                    "done_frac": done.mean(),
                    # keep the GAE outputs live so XLA can't DCE them
                    "adv_mean": advret[0].mean(),
                    "ret_mean": advret[1].mean(),
                    "logp_mean": traj["learner"][9].mean(),
                }
                return ts._replace(
                    state_f=state_f, state_i=state_i, init=jnp.int32(0),
                    key=key,
                ), metrics
            params, opt_state, key, aux = _update_packed(
                cfg, opt, ts.params, ts.opt_state, traj["learner"],
                advret, key, interpret=interpret,
            )
            metrics = {
                "reward_mean": reward.mean(),
                "done_frac": done.mean(),
                "pg_loss": aux[0].mean(),
                "v_loss": aux[1].mean(),
                "entropy": aux[2].mean(),
            }
            return FusedTrainState(
                params=params,
                opt_state=opt_state,
                state_f=state_f,
                state_i=state_i,
                init=jnp.int32(0),
                key=key,
            ), metrics
        # recompute logp/value at the rollout params in one batched forward
        basal = packed_basal(packed_params)  # [B], static per patient
        obs = _features(
            traj["octrl"], traj["oins"], traj["ocho"], traj["oprev"],
            traj["oiob"], basal,
        )  # [T, B, OBS_DIM]
        # the recompute and the minibatch loss forward share one
        # compute_dtype so the epoch-0 ratio at unchanged params is exactly 1
        cdt = jnp.bfloat16 if cfg.learner_bf16 else None
        mu, log_std, value = policy_apply(ts.params, obs, compute_dtype=cdt)
        logp = gaussian_logprob(mu, log_std, traj["raw"])
        tail_obs = _features(
            traj["tail_octrl"], traj["tail_oins"], traj["tail_ocho"],
            traj["tail_oprev"], traj["tail_oiob"], basal,
        )
        _, _, last_value = policy_apply(ts.params, tail_obs, compute_dtype=cdt)

        done = traj["done"]
        base_reward = (
            traj["reward"] if reward_fn is None else reward_fn(traj)
        )
        reward = base_reward - cfg.done_penalty * done.astype(value.dtype)
        # continuing task: BG excursions are not value-function terminals —
        # the state persists and its (bad) future rewards are the signal
        gae_done = jnp.zeros_like(done) if continuing else done
        tr = Transition(
            obs=obs,
            raw_action=traj["raw"],
            logp=logp,
            value=value,
            reward=reward,
            done=gae_done,
        )
        advs, rets = _gae(cfg, tr, last_value)
        if stages == "forward":
            state_f, state_i = jax.lax.optimization_barrier(
                (traj["state_f"], traj["state_i"])
            )
            metrics = {
                "reward_mean": reward.mean(),
                "done_frac": done.mean(),
                # keep the forward/GAE outputs live so XLA can't DCE them
                "adv_mean": advs.mean(),
                "ret_mean": rets.mean(),
                "logp_mean": logp.mean(),
            }
            return ts._replace(
                state_f=state_f, state_i=state_i, init=jnp.int32(0), key=key
            ), metrics
        params, opt_state, key, aux = _update(
            cfg, opt, ts.params, ts.opt_state, tr, advs, rets, key,
            mesh=mesh, interpret=interpret,
        )
        metrics = {
            "reward_mean": reward.mean(),
            "done_frac": done.mean(),
            "pg_loss": aux[0].mean(),
            "v_loss": aux[1].mean(),
            "entropy": aux[2].mean(),
        }
        # outputs that feed back into a donated next call must come from
        # distinct buffers — see envs/rollout.py (the f(donate(a), a)
        # CSE-aliasing hazard)
        state_f, state_i = jax.lax.optimization_barrier(
            (traj["state_f"], traj["state_i"])
        )
        new_ts = FusedTrainState(
            params=params,
            opt_state=opt_state,
            state_f=state_f,
            state_i=state_i,
            init=jnp.int32(0),
            key=key,
        )
        return new_ts, metrics

    return train_step


def make_fused_train_loop(
    cfg: PPOConfig, batch: int, iters_per_call: int, **kwargs
):
    """``lax.scan`` over ``iters_per_call`` fused train steps in ONE jitted
    program: host dispatch happens once per call instead of once per
    iteration (per-step dispatch costs ~100x the 6.6ms device iteration
    over a remote/tunneled runtime).  Returns
    ``loop(packed_params, ts) -> (ts', metrics)`` with metrics stacked
    [iters_per_call]."""
    step = make_fused_train_step(cfg, batch, **kwargs)

    def loop(packed_params, ts: FusedTrainState):
        def body(carry, _):
            return step(packed_params, carry)

        return jax.lax.scan(body, ts, None, length=iters_per_call)

    return loop
