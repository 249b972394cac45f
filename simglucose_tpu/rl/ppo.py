"""On-device PPO actor-learner over sharded patient cohorts.

BASELINE.json configs 4-5: an on-device training loop where the actor rolls
out thousands of auto-resetting envs (patients sharded over the mesh's 'dp'
axis) and the learner updates a shared policy with PPO.  Everything — env
physics, action sampling, GAE, the clipped surrogate, and the optax update —
lives in ONE jitted program per iteration; under GSPMD the batch stays
sharded over 'dp', policy weights shard over 'tp', and XLA inserts the
gradient all-reduce over ICI (the "sharded PPO learner via collectives").
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from simglucose_tpu.core.types import CtrlAction, EnvState, StepResult
from simglucose_tpu.envs.functional import EnvConfig, EnvParams
from simglucose_tpu.envs.rollout import autoreset_step
from simglucose_tpu.rl.policy import (
    PolicyParams,
    featurize,
    gaussian_logprob,
    iob_step,
    policy_apply,
    sample_action,
)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    rollout_steps: int = 64
    epochs: int = 2
    minibatches: int = 4
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 1e-3
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    max_basal: float = 30.0  # Insulet pump limit (params/pump_params.csv)
    # minibatch shuffling granularity (rows).  A full random permutation of
    # T*B rows costs a per-row gather — measured 46 ms of a 73 ms iteration
    # on v5e (random row gathers are scalar-core driven).  Shuffling
    # contiguous blocks of `shuffle_block` rows instead makes the gather a
    # DMA-friendly block copy (~1 ms) while still mixing time steps and
    # patients across minibatches (a block is 1/64th of one time step's
    # lanes at B=8192).  Rounded down to a power-of-two divisor of the
    # minibatch size at trace time.
    shuffle_block: int = 512
    # reset-candidate / midnight-regen sampling cadence for the XLA rollout
    # (envs/rollout.py autoreset_step_with_candidate): 1 = exact per-step
    # resets; K > 1 amortizes the rare-path sampling over K-step chunks —
    # trajectory-exact for surviving lanes, candidate resets drawn up to K
    # steps early for dying ones (same law).  The fused pallas trainer has
    # its own regen_every analog.  rollout_steps must be divisible by K.
    reset_cadence: int = 1
    # upper bound of the policy's basal range (U/min): the squashed Gaussian
    # emits basal in [0, action_scale].  The pump ceiling (30 U/min) is ~500x
    # a therapeutic basal (~0.01-0.06, vpatient u2ss*BW/6000), so exploring
    # the full pump range gives every action the same outcome (fatal hypo)
    # and no gradient; 0.2 covers ~4x the strongest cohort basal while
    # keeping the explored band informative.
    action_scale: float = 0.2
    # scale the emitted basal by each patient's own therapy basal
    # (u2ss*BW/6000): action = sigmoid(raw) * action_scale * patient_basal,
    # so one policy output means the same therapy INTENSITY for a 25 kg
    # child and a 110 kg adult (cohort basals span ~6x).  The pallas-fused
    # trainer's analog is the kernel's nn_scale_by_basal config
    # (rl/fused.py wires this flag through); the deploy-side analog is
    # policy_controller(..., basal=...).
    scale_by_basal: bool = False
    # action decoder (rl/policy.py PolicyParams.decoder): 'sigmoid' — the
    # absolute-rate decoder above; 'residual_bb' — the policy modulates
    # basal-bolus therapy, rate = bb_cmd * exp(action_scale * tanh(raw)).
    # residual_bb trains on the pallas-fused path only (the kernel computes
    # the BB command from the Quest planes in-kernel); action_scale is the
    # log-range and scale_by_basal is ignored.
    decoder: str = "sigmoid"
    init_log_std: float = -0.5
    # mixed-precision learner: cast matmul inputs (activations + weights) to
    # bf16 in the PPO loss forward/backward — f32 accumulation on the MXU,
    # f32 params/optimizer state (policy_apply compute_dtype).  ~2x the
    # learner matmul throughput; the policy ratio stays consistent because
    # logp_old and the minibatch logp are recomputed by the same bf16
    # forward in the fused trainer.  Off by default (CI trains f32).
    learner_bf16: bool = False
    # pallas learner modes (ops/pallas_ppo_learner.py):
    #   True | 'step' — each minibatch grad step is ONE fused kernel
    #     (forward + clipped-surrogate loss + hand-derived backward over
    #     VMEM-resident row tiles, shuffle gathered via scalar-prefetched
    #     block indices) instead of XLA's ~10 HBM-streaming kernels;
    #   'epoch' — the WHOLE learner (every epoch, minibatch, global-norm
    #     clip, and adam update) is one kernel launch: weights + moments
    #     live in VMEM scratch across the grid, optax's exact math applied
    #     at minibatch boundaries.
    # Under a pure-dp mesh the 'step' kernel runs per device inside
    # shard_map with one gradient psum per minibatch (_update_pallas_dp);
    # tp-sharded weights and the 'epoch' kernel fall back to the XLA
    # learner under a mesh.
    # Gradient/update parity pinned by tests/test_pallas_ppo_learner.py.
    pallas_learner: Union[bool, str] = False
    # subtracted from the step reward when the episode terminates (BG<70 or
    # BG>350).  With auto-reset, termination respawns the patient at a
    # healthy BG, so under dense negative rewards a policy can "farm" the
    # low-risk post-reset steps by dying quickly; an explicit terminal
    # penalty removes that exploit.  0 preserves the env's raw reward.
    done_penalty: float = 0.0


class TrainState(NamedTuple):
    params: PolicyParams
    opt_state: optax.OptState
    env_state: EnvState
    prev_res: StepResult
    key: jax.Array
    # observation-memory carries for the trend / insulin-on-board features
    # (rl/policy.py featurize_parts): the CGM sample before prev_res's and
    # the decayed delivered-insulin sum.  None (the default) means the
    # cold-start values — zero trend, zero IOB, exactly the episode-reset
    # observation — so construction from a fresh batch_reset stays a
    # 5-field call.
    cgm_prev: Optional[jnp.ndarray] = None
    iob: Optional[jnp.ndarray] = None


class Transition(NamedTuple):
    obs: jnp.ndarray
    raw_action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def make_optimizer(cfg: PPOConfig):
    # flatten: clip + adam run over ONE packed [P] vector instead of 9
    # small leaves — same math, ~1/9th the tiny-kernel launches per
    # minibatch (the learner is launch-bound, not FLOPs-bound: the whole
    # policy is ~5K params).
    # NOTE: flatten changes the opt_state pytree (adam mu/nu become single
    # [P] vectors), so optimizer states checkpointed before this change do
    # not restore against the new layout (restore_state raises a leaf
    # mismatch).  POLICY checkpoints (params only, e.g. the shipped
    # examples/checkpoints) are unaffected; to resume an old run, restore
    # against ``legacy_optimizer(cfg).init(params)`` and convert with
    # :func:`migrate_opt_state`.
    return optax.flatten(_base_optimizer(cfg))


def _base_optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
    )


def legacy_optimizer(cfg: PPOConfig):
    """The pre-flatten optimizer layout (mu/nu as PolicyParams pytrees).
    Its ``.init(params)`` is the restore TEMPLATE for optimizer-state
    checkpoints saved before :func:`make_optimizer` gained
    ``optax.flatten``; pass the restored state to
    :func:`migrate_opt_state` to resume training with the current
    optimizer."""
    return _base_optimizer(cfg)


def migrate_opt_state(legacy_opt_state, params: PolicyParams, cfg: PPOConfig):
    """Convert a legacy (unflattened) optimizer state to the current
    flattened layout, preserving the adam step count and moments.

    Usage for a pre-flatten checkpoint::

        tmpl = (params_template, legacy_optimizer(cfg).init(params_template))
        params, old_opt = restore_state(path, tmpl)
        opt_state = migrate_opt_state(old_opt, params, cfg)

    The moment vectors are raveled in ``jax.flatten_util.ravel_pytree``
    order — exactly how ``optax.flatten`` lays them out."""
    from jax.flatten_util import ravel_pytree

    new_state = make_optimizer(cfg).init(params)
    old_adam = _find_adam_state(legacy_opt_state)
    new_adam = optax.ScaleByAdamState(
        count=old_adam.count,
        mu=ravel_pytree(old_adam.mu)[0],
        nu=ravel_pytree(old_adam.nu)[0],
    )
    return _replace_adam_state(new_state, new_adam)


def _rollout(
    cfg: PPOConfig,
    env_cfg: EnvConfig,
    env_params: EnvParams,
    params: PolicyParams,
    env_state: EnvState,
    prev_res: StepResult,
    cgm_prev: jnp.ndarray,
    iob: jnp.ndarray,
    patient_basal: jnp.ndarray,
    key: jax.Array,
    mesh: Optional[Mesh],
    reward_fun=None,
):
    """Collect rollout_steps transitions from the batched auto-reset env.

    ``cgm_prev``/``iob`` are the observation-memory carries behind the
    trend and insulin-on-board features (rl/policy.py featurize_parts);
    both follow the auto-reset semantics the pallas 'nn' kernel implements
    (zero trend and zero IOB on the post-reset observation)."""
    step_kwargs = {} if reward_fun is None else {"reward_fun": reward_fun}
    st = env_cfg.sample_time

    def make_body(step_env):
        def body(carry, _):
            env_state, prev, cgm_prev, iob, key = carry
            key, k_act = jax.random.split(key)
            obs = featurize(prev, patient_basal, cgm_prev=cgm_prev, iob=iob)
            basal, raw, logp, value = sample_action(
                params, obs, k_act, scale=cfg.action_scale, mesh=mesh
            )
            if cfg.scale_by_basal:
                basal = basal * patient_basal
            action = CtrlAction(basal=basal, bolus=jnp.zeros_like(basal))
            env_state, res, carry_res = step_env(env_state, action)
            reward = res.reward - cfg.done_penalty * res.done.astype(value.dtype)
            tr = Transition(
                obs=obs,
                raw_action=raw,
                logp=logp,
                value=value,
                reward=reward,
                done=res.done,
            )
            # next obs memory: trend baseline is the CGM just acted on; IOB
            # decays and adds the DELIVERED (post-pump-quantization) dose.  A
            # reset zeroes both (the new episode's obs has no history).
            done = res.done
            next_cgm_prev = jnp.where(
                done, carry_res.observation.CGM, prev.observation.CGM
            )
            next_iob = jnp.where(
                done, jnp.zeros_like(iob), iob_step(iob, res.insulin, st)
            )
            # carry the post-reset observation forward: the first action of
            # each new episode is computed from the new episode's CGM
            # (reference semantics, simglucose_gym_env.py:48-51)
            return (env_state, carry_res, next_cgm_prev, next_iob, key), tr

        return body

    init = (env_state, prev_res, cgm_prev, iob, key)
    K = cfg.reset_cadence
    if K <= 1:
        body = make_body(
            lambda s, a: jax.vmap(partial(autoreset_step, env_cfg, **step_kwargs))(
                env_params, s, a
            )
        )
        carry, traj = jax.lax.scan(body, init, None, length=cfg.rollout_steps)
    else:
        # cadenced rare-path sampling (see PPOConfig.reset_cadence and
        # envs/rollout.py make_batch_rollout_fn): candidates + midnight
        # regen hoisted to chunk boundaries
        from simglucose_tpu.envs.rollout import (
            autoreset_step_with_candidate,
            make_reset_candidates,
        )
        from simglucose_tpu.scenario.meal import scenario_regen_now

        def chunk(carry, _):
            env_state, prev, cgm_prev, iob, key = carry
            if env_cfg.scenario_mode == "random":
                dt = env_state.scenario.meal_times.dtype
                scen = jax.vmap(
                    lambda s, t: scenario_regen_now(s, t, dtype=dt)
                )(env_state.scenario, env_state.patient.t)
                env_state = env_state._replace(scenario=scen)
            cand, cand_res = jax.vmap(
                partial(make_reset_candidates, env_cfg)
            )(env_params, env_state)
            body = make_body(
                lambda s, a: jax.vmap(
                    partial(autoreset_step_with_candidate, env_cfg, **step_kwargs)
                )(env_params, s, a, cand, cand_res)
            )
            carry, traj = jax.lax.scan(
                body, (env_state, prev, cgm_prev, iob, key), None, length=K
            )
            return carry, traj

        carry, traj = jax.lax.scan(
            chunk, init, None, length=cfg.rollout_steps // K
        )
        traj = jax.tree.map(
            lambda a: a.reshape((cfg.rollout_steps,) + a.shape[2:]), traj
        )
    env_state, last_res, cgm_prev, iob, key = carry
    return env_state, last_res, cgm_prev, iob, key, traj


def _gae(cfg: PPOConfig, traj: Transition, last_value: jnp.ndarray):
    """Generalized advantage estimation over the [T, B] rollout.

    The backward recurrence ``adv_t = delta_t + (gamma*lam*nonterm_t) *
    adv_{t+1}`` is a linear first-order recurrence, so it runs as a
    parallel ``associative_scan`` over the time axis — log2(T) rounds of
    full [T, B] elementwise work instead of T sequential [B]-sized kernel
    launches (the sequential scan was launch-bound: 4.9 ms for T=64,
    B=8192 on v5e; this form is <1 ms)."""
    nonterm = 1.0 - traj.done.astype(traj.value.dtype)
    v_next = jnp.concatenate([traj.value[1:], last_value[None]], axis=0)
    delta = traj.reward + cfg.gamma * v_next * nonterm - traj.value
    coef = cfg.gamma * cfg.lam * nonterm

    # composing f_t(x) = d_t + c_t * x.  reverse=True reduces suffixes with
    # the LATER element on the left, so combine(a, b) must express
    # "apply a (the later suffix), then b": b ∘ a = (c_b c_a, d_b + c_b d_a)
    def combine(a, b):
        ca, da = a
        cb, db = b
        return ca * cb, db + cb * da

    _, advs = jax.lax.associative_scan(combine, (coef, delta), reverse=True)
    returns = advs + traj.value
    return advs, returns


def _ppo_loss(
    cfg: PPOConfig,
    params: PolicyParams,
    batch,
    mesh: Optional[Mesh],
):
    obs, raw, logp_old, adv, ret = batch
    mu, log_std, value = policy_apply(
        params, obs, mesh=mesh,
        compute_dtype=jnp.bfloat16 if cfg.learner_bf16 else None,
    )
    logp = gaussian_logprob(mu, log_std, raw)
    ratio = jnp.exp(logp - logp_old)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * adv_n
    pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
    pg_loss = -jnp.minimum(pg1, pg2).mean()
    v_loss = 0.5 * jnp.square(value - ret).mean()
    entropy = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).mean()
    loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
    return loss, (pg_loss, v_loss, entropy)


def _find_adam_state(opt_state) -> optax.ScaleByAdamState:
    """Locate the ScaleByAdamState inside make_optimizer's (flattened)
    state tree — under optax.flatten the mu/nu leaves are single [P]
    vectors in jax.flatten_util.ravel_pytree order."""
    found = []

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            found.append(s)
        elif isinstance(s, (tuple, list)):
            for x in s:
                rec(x)

    rec(opt_state)
    if len(found) != 1:  # pragma: no cover - make_optimizer always has one
        raise ValueError(f"expected one ScaleByAdamState, found {len(found)}")
    return found[0]


def _replace_adam_state(opt_state, new):
    if isinstance(opt_state, optax.ScaleByAdamState):
        return new
    if isinstance(opt_state, tuple) and hasattr(opt_state, "_fields"):
        return type(opt_state)(
            *(_replace_adam_state(x, new) for x in opt_state)
        )
    if isinstance(opt_state, tuple):
        return tuple(_replace_adam_state(x, new) for x in opt_state)
    return opt_state


def _epoch_kernel_update(
    cfg: PPOConfig, params, opt_state, packed, adv_bsum, adv_bsq,
    n_blocks, bs, mb_size, key, interpret,
):
    """cfg.pallas_learner == 'epoch': the whole learner in one kernel
    (ops/pallas_ppo_learner.ppo_epoch_update), with full
    make_optimizer-state interop.  Same key chain as the XLA epoch scan."""
    import dataclasses as _dc

    from jax.flatten_util import ravel_pytree

    from simglucose_tpu.ops.pallas_ppo_learner import (
        OBS_DIM as OBS_DIM_,
        ppo_epoch_update,
    )

    if n_blocks % cfg.minibatches:
        raise ValueError(
            f"pallas_learner='epoch' needs the shuffle-block count "
            f"({n_blocks}) divisible by minibatches ({cfg.minibatches}) — "
            "use the 'step' mode or a batch where T*B/shuffle_block "
            "divides evenly"
        )
    bpm = n_blocks // cfg.minibatches
    perms, stats = [], []
    for _ in range(cfg.epochs):
        key, k_perm = jax.random.split(key)
        p = jax.random.permutation(k_perm, n_blocks)
        perms.append(p)
        s1 = adv_bsum[p].reshape(cfg.minibatches, bpm).sum(axis=1)
        s2 = adv_bsq[p].reshape(cfg.minibatches, bpm).sum(axis=1)
        mean = s1 / mb_size
        std = jnp.sqrt(jnp.maximum(s2 / mb_size - mean * mean, 0.0))
        stats.append(jnp.stack([mean, 1.0 / (std + 1e-8)], axis=1))
    perm_all = jnp.concatenate(perms)
    stats = jnp.concatenate(stats, axis=0)  # [E*MB, 2]

    adam = _find_adam_state(opt_state)
    _, unravel = ravel_pytree(params)
    mu_t = unravel(adam.mu)
    nu_t = unravel(adam.nu)

    H = params.w1.shape[1]
    f32 = jnp.float32

    def lay(p):  # PolicyParams -> the kernel's 6 weight-layout arrays
        return (
            jnp.pad(p.w1.astype(f32), ((0, 1), (0, 0))).T,  # [H, 8]
            p.b1.astype(f32).reshape(H, 1),
            p.w2.astype(f32).T,
            p.b2.astype(f32).reshape(H, 1),
            jnp.concatenate([p.w_mu, p.w_v], axis=1).astype(f32).T,  # [2,H]
            jnp.concatenate([p.b_mu, p.b_v]).astype(f32).reshape(2, 1),
        )

    ls = jnp.stack(
        [params.log_std[0], mu_t.log_std[0], nu_t.log_std[0]]
    ).astype(f32)
    w_out, m_out, v_out, ls_out, aux = ppo_epoch_update(
        packed,
        perm_all,
        bs,
        bpm,
        stats,
        lay(params),
        lay(mu_t),
        lay(nu_t),
        ls,
        mb_rows=mb_size,
        lr=cfg.lr,
        max_grad_norm=cfg.max_grad_norm,
        ent_coef=cfg.ent_coef,
        adam_count=adam.count,
        act=params.act,
        clip_eps=cfg.clip_eps,
        vf_coef=cfg.vf_coef,
        compute_dtype=jnp.bfloat16 if cfg.learner_bf16 else jnp.float32,
        interpret=interpret,
    )

    def unlay(tmpl, arrs, log_std_val):
        return _dc.replace(
            tmpl,
            w1=arrs[0].T[:OBS_DIM_],
            b1=arrs[1][:, 0],
            w2=arrs[2].T,
            b2=arrs[3][:, 0],
            w_mu=arrs[4].T[:, 0:1],
            w_v=arrs[4].T[:, 1:2],
            b_mu=arrs[5][0:1, 0],
            b_v=arrs[5][1:2, 0],
            log_std=log_std_val.reshape(1),
        )

    new_params = unlay(params, w_out, ls_out[0])
    new_mu = unlay(params, m_out, ls_out[1])
    new_nu = unlay(params, v_out, ls_out[2])
    new_adam = optax.ScaleByAdamState(
        count=adam.count + cfg.epochs * cfg.minibatches,
        mu=ravel_pytree(new_mu)[0],
        nu=ravel_pytree(new_nu)[0],
    )
    new_opt_state = _replace_adam_state(opt_state, new_adam)
    aux3 = (
        aux[:, 0].reshape(cfg.epochs, cfg.minibatches),
        aux[:, 1].reshape(cfg.epochs, cfg.minibatches),
        aux[:, 2].reshape(cfg.epochs, cfg.minibatches),
    )
    return new_params, new_opt_state, key, aux3


def _gradout_to_grads(cfg: PPOConfig, params, out, mb_size):
    """PPOGradOut (the fused grad-step kernel's sums) -> (PolicyParams-
    shaped grads with the entropy term folded into log_std, aux loss
    triple).  Shared by the 12-row single-buffer learner path and the
    two-buffer kernel-prep path."""
    import dataclasses as _dc
    import math as _math

    ent_const = 0.5 * _math.log(2 * _math.pi * _math.e)
    grads = _dc.replace(
        params,
        w1=out.dw1,
        b1=out.db1,
        w2=out.dw2,
        b2=out.db2,
        w_mu=out.dw_head[:, 0:1],
        b_mu=out.db_head[0:1],
        w_v=out.dw_head[:, 1:2],
        b_v=out.db_head[1:2],
        log_std=(out.dlog_std - cfg.ent_coef).reshape(1),
    )
    aux = (
        out.pg_sum / mb_size,
        out.v_sum / mb_size,
        params.log_std[0] + ent_const,
    )
    return grads, aux


def _shuffle_blocking(cfg: PPOConfig, N: int):
    """(block_rows, n_blocks, mb_size): the block-granular shuffle layout
    for an N-row buffer (see PPOConfig.shuffle_block) — one definition for
    every learner path."""
    mb_size = N // cfg.minibatches
    # keep >=256 blocks so small (CI-scale) runs still mix well; at bench
    # scale (N=524288) this is the full 512-row block size
    bs = max(1, min(cfg.shuffle_block, N // 256))
    while mb_size % bs:
        bs //= 2
    return bs, N // bs, mb_size


def _update_packed(
    cfg: PPOConfig,
    opt,
    params: PolicyParams,
    opt_state,
    main_fm: jnp.ndarray,  # [10, N] the rollout kernel's learner buffer
    advret_fm: jnp.ndarray,  # [2, N] (adv, ret) from GAE
    key: jax.Array,
    interpret: bool = False,
):
    """The PPO learner over the rollout kernel's emit-mode buffers
    (``nn_emit_learner_rows``): same epochs x minibatches x block-granular
    shuffle as :func:`_update`, but the minibatch grad step consumes the
    [10, N] buffer EXACTLY as the rollout kernel wrote it plus the [2, N]
    adv/ret companion — no featurize / forward / repack stage in between
    (ops/pallas_ppo_learner.ppo_grad_step_gather2).  Single-device
    pallas-learner path only."""
    from simglucose_tpu.ops.pallas_ppo_learner import ppo_grad_step_gather2

    N = main_fm.shape[1]
    bs, n_blocks, mb_size = _shuffle_blocking(cfg, N)
    bpm = n_blocks // cfg.minibatches
    adv_b = advret_fm[0].reshape(n_blocks, bs)
    adv_bsum = adv_b.sum(axis=1)
    adv_bsq = (adv_b * adv_b).sum(axis=1)
    cdt = jnp.bfloat16 if cfg.learner_bf16 else jnp.float32

    def epoch(carry, _):
        params, opt_state, key = carry
        key, k_perm = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n_blocks)

        def minibatch(carry, i):
            params, opt_state = carry
            perm_mb = jax.lax.dynamic_slice_in_dim(perm, i * bpm, bpm)
            s1 = adv_bsum[perm_mb].sum()
            s2 = adv_bsq[perm_mb].sum()
            mean = s1 / mb_size
            std = jnp.sqrt(jnp.maximum(s2 / mb_size - mean * mean, 0.0))
            out = ppo_grad_step_gather2(
                main_fm,
                advret_fm,
                perm_mb,
                bs,
                params.w1, params.b1, params.w2, params.b2,
                jnp.concatenate([params.w_mu, params.w_v], axis=1),
                jnp.concatenate([params.b_mu, params.b_v]),
                params.log_std[0],
                mean, std,
                act=params.act,
                clip_eps=cfg.clip_eps,
                vf_coef=cfg.vf_coef,
                compute_dtype=cdt,
                interpret=interpret,
            )
            grads, aux = _gradout_to_grads(cfg, params, out, mb_size)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), aux

        (params, opt_state), aux = jax.lax.scan(
            minibatch, (params, opt_state), jnp.arange(cfg.minibatches)
        )
        return (params, opt_state, key), aux

    (params, opt_state, key), aux = jax.lax.scan(
        epoch, (params, opt_state, key), None, length=cfg.epochs
    )
    return params, opt_state, key, aux


def _update_pallas_dp(
    cfg: PPOConfig,
    opt,
    params: PolicyParams,
    opt_state,
    traj: Transition,
    advs: jnp.ndarray,
    rets: jnp.ndarray,
    key: jax.Array,
    mesh: Mesh,
    interpret: bool = False,
):
    """The fused grad-step learner kernel under a DATA-PARALLEL mesh
    (``cfg.pallas_learner`` with ``mesh``): each device runs
    ``ppo_grad_step_gather`` over its LOCAL rows inside ``shard_map`` and
    the gradient/statistic sums ride one ``psum`` per minibatch — the
    sharded-PPO-learner collective contract (BASELINE config 5) with the
    kernel learner instead of the XLA one.

    Law note vs the single-device learner: the block-granular shuffle
    permutes each device's LOCAL blocks (same replicated key -> same
    permutation indices on every device), so a minibatch is the union of
    per-device block draws rather than one global draw.  Advantage
    mean/std and the loss means are computed over the GLOBAL minibatch
    via psum, and every device applies the identical optimizer update —
    post-update params are bit-identical across hosts
    (tests/test_multihost_multiprocess.py)."""
    import dataclasses as _dc

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from simglucose_tpu.ops.pallas_ppo_learner import (
        pack_minibatch_rows,
        ppo_grad_step_gather,
    )

    axis = "dp"
    ndev = mesh.shape[axis]
    T, B = traj.reward.shape
    Bl = B // ndev
    Nl = T * Bl
    obs_dim = traj.obs.shape[-1]
    bs, n_blocks, mb_size_l = _shuffle_blocking(cfg, Nl)
    bpm = n_blocks // cfg.minibatches
    mb_global = mb_size_l * ndev
    cdt = jnp.bfloat16 if cfg.learner_bf16 else jnp.float32

    def local_update(params, opt_state, key, obs, raw, logp, advs, rets):
        # local shapes: [T, Bl, ...]; params/opt_state/key replicated
        packed = pack_minibatch_rows(
            obs.reshape(Nl, obs_dim),
            raw.reshape(Nl),
            logp.reshape(Nl),
            advs.reshape(Nl),
            rets.reshape(Nl),
        )
        adv_b = advs.reshape(n_blocks, bs)
        adv_bsum = adv_b.sum(axis=1)
        adv_bsq = (adv_b * adv_b).sum(axis=1)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n_blocks)

            def minibatch(carry, i):
                params, opt_state = carry
                perm_mb = jax.lax.dynamic_slice_in_dim(perm, i * bpm, bpm)
                # GLOBAL minibatch advantage stats: one psum of the
                # local block sums
                s1 = jax.lax.psum(adv_bsum[perm_mb].sum(), axis)
                s2 = jax.lax.psum(adv_bsq[perm_mb].sum(), axis)
                mean = s1 / mb_global
                std = jnp.sqrt(
                    jnp.maximum(s2 / mb_global - mean * mean, 0.0)
                )
                out = ppo_grad_step_gather(
                    packed,
                    perm_mb,
                    bs,
                    params.w1, params.b1, params.w2, params.b2,
                    jnp.concatenate([params.w_mu, params.w_v], axis=1),
                    jnp.concatenate([params.b_mu, params.b_v]),
                    params.log_std[0],
                    mean, std,
                    act=params.act,
                    clip_eps=cfg.clip_eps,
                    vf_coef=cfg.vf_coef,
                    compute_dtype=cdt,
                    interpret=interpret,
                    # the kernel's 1/N loss scaling uses the GLOBAL row
                    # count so psum of per-device grads IS the global mean
                    loss_rows=mb_global,
                )
                out = jax.tree.map(lambda g: jax.lax.psum(g, axis), out)
                grads, aux = _gradout_to_grads(cfg, params, out, mb_global)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), aux = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(cfg.minibatches)
            )
            return (params, opt_state, key), aux

        (params, opt_state, key), aux = jax.lax.scan(
            epoch, (params, opt_state, key), None, length=cfg.epochs
        )
        return params, opt_state, key, aux

    rep = P()
    shard_tb = P(None, axis)
    shard_obs = P(None, axis, None)
    fn = shard_map(
        local_update,
        mesh=mesh,
        in_specs=(rep, rep, rep, shard_obs, shard_tb, shard_tb, shard_tb,
                  shard_tb),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return fn(
        params, opt_state, key,
        traj.obs, traj.raw_action, traj.logp, advs, rets,
    )


def _update(
    cfg: PPOConfig,
    opt,
    params: PolicyParams,
    opt_state,
    traj: Transition,
    advs: jnp.ndarray,
    rets: jnp.ndarray,
    key: jax.Array,
    mesh: Optional[Mesh],
    interpret: bool = False,
):
    """The PPO learner: epochs x minibatches of clipped-surrogate updates
    over a [T, B] rollout.  Shared by the XLA-rollout trainer
    (:func:`make_train_step`) and the pallas-fused trainer (rl/fused.py).

    Minibatches are drawn by BLOCK-granular shuffling of one packed buffer:
    a full random permutation of T*B rows costs a per-row gather — measured
    46 ms of a 73 ms iteration on v5e (random row gathers are scalar-core
    driven) — while permuting contiguous blocks is a DMA-friendly copy
    (~1 ms) that still mixes time steps and patients across minibatches.

    With ``cfg.pallas_learner`` (and no mesh) the packed buffer is
    FEATURE-MAJOR and each grad step runs as one fused pallas kernel
    (ops/pallas_ppo_learner.py); the shuffle, adam, and scan scaffolding
    are identical."""
    T, B = traj.reward.shape
    N = T * B
    obs_dim = traj.obs.shape[-1]
    if (
        bool(cfg.pallas_learner)
        and mesh is not None
        and cfg.pallas_learner != "epoch"
        and "dp" in mesh.axis_names
        and ("tp" not in mesh.axis_names or mesh.shape["tp"] == 1)
        and B % mesh.shape["dp"] == 0
        # pallas only lowers on TPU (or under interpret, which only the
        # fused trainer threads through) — callers without interpret
        # plumbing (make_train_step) keep the round-4 XLA-learner
        # fallback on CPU/gloo meshes instead of failing to lower
        and (interpret or jax.default_backend() == "tpu")
    ):
        # the kernel learner under a data-parallel mesh: per-device grad
        # kernels + one psum per minibatch (tp-sharded weights stay on
        # the XLA learner)
        return _update_pallas_dp(
            cfg, opt, params, opt_state, traj, advs, rets, key, mesh,
            interpret,
        )
    use_pallas = bool(cfg.pallas_learner) and mesh is None
    bs, n_blocks, mb_size = _shuffle_blocking(cfg, N)

    if use_pallas:
        from simglucose_tpu.ops.pallas_ppo_learner import (
            pack_minibatch_rows,
            ppo_grad_step_gather,
        )

        packed = pack_minibatch_rows(
            traj.obs.reshape(N, obs_dim),
            traj.raw_action.reshape(N),
            traj.logp.reshape(N),
            advs.reshape(N),
            rets.reshape(N),
        )  # [FM_ROWS, N]
        # per-shuffle-block advantage sums: each minibatch's adv mean/std
        # (the values jnp.mean/std would produce) combine from its blocks'
        # sums — a [blocks_per_mb] gather instead of a [mb] reduction
        adv_b = advs.reshape(n_blocks, bs)
        adv_bsum = adv_b.sum(axis=1)
        adv_bsq = (adv_b * adv_b).sum(axis=1)
        bpm = n_blocks // cfg.minibatches
        if cfg.pallas_learner == "epoch":
            return _epoch_kernel_update(
                cfg, params, opt_state, packed, adv_bsum, adv_bsq,
                n_blocks, bs, mb_size, key, interpret,
            )
        cdt = jnp.bfloat16 if cfg.learner_bf16 else jnp.float32
    else:
        packed = jnp.concatenate(
            [
                traj.obs.reshape(N, obs_dim),
                traj.raw_action.reshape(N, 1),
                traj.logp.reshape(N, 1),
                advs.reshape(N, 1),
                rets.reshape(N, 1),
            ],
            axis=1,
        )

    def epoch(carry, _):
        params, opt_state, key = carry
        key, k_perm = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n_blocks)
        if not use_pallas:
            shuffled = packed.reshape(n_blocks, bs, obs_dim + 4)[perm]
            shuffled = shuffled.reshape(N, obs_dim + 4)

        def minibatch(carry, i):
            params, opt_state = carry
            if use_pallas:
                perm_mb = jax.lax.dynamic_slice_in_dim(perm, i * bpm, bpm)
                s1 = adv_bsum[perm_mb].sum()
                s2 = adv_bsq[perm_mb].sum()
                mean = s1 / mb_size
                std = jnp.sqrt(jnp.maximum(s2 / mb_size - mean * mean, 0.0))
                out = ppo_grad_step_gather(
                    packed,
                    perm_mb,
                    bs,
                    params.w1, params.b1, params.w2, params.b2,
                    jnp.concatenate([params.w_mu, params.w_v], axis=1),
                    jnp.concatenate([params.b_mu, params.b_v]),
                    params.log_std[0],
                    mean, std,
                    act=params.act,
                    clip_eps=cfg.clip_eps,
                    vf_coef=cfg.vf_coef,
                    compute_dtype=cdt,
                    interpret=interpret,
                )
                grads, aux = _gradout_to_grads(cfg, params, out, mb_size)
            else:
                rows = jax.lax.dynamic_slice_in_dim(
                    shuffled, i * mb_size, mb_size
                )
                mb = (
                    rows[:, :obs_dim],
                    rows[:, obs_dim],
                    rows[:, obs_dim + 1],
                    rows[:, obs_dim + 2],
                    rows[:, obs_dim + 3],
                )
                grads, aux = jax.grad(
                    lambda p: _ppo_loss(cfg, p, mb, mesh), has_aux=True
                )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), aux

        (params, opt_state), aux = jax.lax.scan(
            minibatch, (params, opt_state), jnp.arange(cfg.minibatches)
        )
        return (params, opt_state, key), aux

    (params, opt_state, key), aux = jax.lax.scan(
        epoch, (params, opt_state, key), None, length=cfg.epochs
    )
    return params, opt_state, key, aux


def make_train_step(
    cfg: PPOConfig,
    env_cfg: EnvConfig,
    mesh: Optional[Mesh] = None,
    reward_fun=None,
):
    """Build the jitted PPO iteration: rollout + GAE + epochs of minibatch
    updates.  ``env_params`` is a jit argument so it can carry shardings.

    ``reward_fun`` overrides the env's default risk-diff reward for
    training (the reference's pluggable ``reward_fun`` kwarg,
    reference: envs/simglucose_gym_env.py:27, simulation/env.py:100-102).
    Reference-style 1-arg rewards over the BG-last-hour history are
    adapted via :func:`~simglucose_tpu.envs.functional.wrap_reward_fn`,
    exactly like the gym adapters and ``simulate()``."""
    if reward_fun is not None:
        from simglucose_tpu.envs.functional import wrap_reward_fn

        reward_fun = wrap_reward_fn(reward_fun, env_cfg.window_size)
    if cfg.decoder != "sigmoid":
        raise ValueError(
            "the XLA-rollout trainer implements the 'sigmoid' decoder "
            "only; decoder='residual_bb' trains on the pallas-fused path "
            "(rl/fused.make_fused_train_step — the kernel computes the BB "
            "command in-kernel)"
        )
    if cfg.reset_cadence > 1:
        if cfg.rollout_steps % cfg.reset_cadence:
            raise ValueError(
                f"rollout_steps={cfg.rollout_steps} not divisible by "
                f"reset_cadence={cfg.reset_cadence}"
            )
        if cfg.reset_cadence * env_cfg.sample_time >= 300:
            raise ValueError(
                "reset_cadence*sample_time must stay inside the 5h "
                "post-midnight meal-free window (envs/rollout.py "
                "make_batch_rollout_fn)"
            )
    opt = make_optimizer(cfg)

    def train_step(env_params: EnvParams, ts: TrainState):
        from simglucose_tpu.models.uva_padova import basal_rate
        from simglucose_tpu.rl.policy import check_action_decoder

        check_action_decoder(
            ts.params, cfg.action_scale, cfg.scale_by_basal, "make_train_step"
        )
        patient_basal = basal_rate(env_params.patient)
        cgm0 = ts.prev_res.observation.CGM
        # None carries = the cold start (zero trend, zero IOB — exactly the
        # episode-reset observation, see TrainState)
        cgm_prev = cgm0 if ts.cgm_prev is None else ts.cgm_prev
        iob = jnp.zeros_like(cgm0) if ts.iob is None else ts.iob
        env_state, last_res, cgm_prev, iob, key, traj = _rollout(
            cfg, env_cfg, env_params, ts.params, ts.env_state, ts.prev_res,
            cgm_prev, iob, patient_basal, ts.key, mesh,
            reward_fun=reward_fun,
        )
        _, _, last_value = policy_apply(
            ts.params,
            featurize(last_res, patient_basal, cgm_prev=cgm_prev, iob=iob),
            mesh=mesh,
        )
        advs, rets = _gae(cfg, traj, last_value)
        params, opt_state, key, aux = _update(
            cfg, opt, ts.params, ts.opt_state, traj, advs, rets, key, mesh
        )
        metrics = {
            "reward_mean": traj.reward.mean(),
            "done_frac": traj.done.mean(),
            "pg_loss": aux[0].mean(),
            "v_loss": aux[1].mean(),
            "entropy": aux[2].mean(),
        }
        new_ts = TrainState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            prev_res=last_res,
            key=key,
            cgm_prev=cgm_prev,
            iob=iob,
        )
        return new_ts, metrics

    return train_step
