#!/usr/bin/env python
"""Train the fused-PPO glucose controller at cohort scale on TPU and ship
the best checkpoint.

The training loop is rl/fused.py's pallas-actor + XLA-learner iteration
(BASELINE config 4) at B=8192; every EVAL_EVERY iterations the CURRENT
policy is evaluated deterministically (mean action) on the full 30-patient
clinical cohort for 24 h through the XLA env path — the same protocol as
the committed CI gate (tests/test_ppo_eval.py) and the reference's
published cohort stats (examples/results/.../performance_stats.csv).  The
checkpoint with the lowest cohort mean risk index is written to
examples/checkpoints/ppo_cohort_relu64.npz.

Reference analog: examples/run_rllab.py:1-43 (the reference's only
end-to-end RL training), scaled to the full cohort with a clinical
evaluation gate.

Usage: python tools/train_ppo_tpu.py [n_blocks] [iters_per_block]
"""
import json
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/simglucose_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = 8192
HIDDEN = 64
CKPT = os.environ.get("PPO_CKPT") or os.path.join(
    os.path.dirname(__file__), "..", "examples", "checkpoints",
    "ppo_cohort_relu64.npz",
)


def cohort_eval(params, hours=24.0, seed=999):
    # checkpoint selection uses seed 999; the CI gate (tests/test_ppo_eval.py)
    # judges at an unrelated seed, so selection cannot overfit the gate.
    # The action decoder comes from the params' own static metadata.
    from simglucose_tpu import params as tables
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.rl.evaluate import evaluate_controller, policy_controller

    names = tables.patient_names()
    basal = basal_rate(tables.load_patient_params(names, dtype=np.float32))
    quest = None
    if getattr(params, "decoder", "sigmoid") == "residual_bb":
        quest = tables.load_quest_params(names, dtype=np.float32)
    res = evaluate_controller(
        policy_controller(params, basal, quest=quest),
        names, hours=hours, seed=seed,
    )
    return res


def main():
    from simglucose_tpu.envs.build import cohort_names, make_env
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.ops.pallas_rollout import pack_params
    from simglucose_tpu.rl.fused import init_fused_state, make_fused_train_loop
    from simglucose_tpu.rl.policy import init_policy
    from simglucose_tpu.rl.ppo import PPOConfig, make_optimizer
    from simglucose_tpu.utils.checkpoint import save_state

    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    # 8 iterations x 64 steps x 3 min = 25.6 simulated hours per block:
    # fresh episodes every block (init=1), eval-horizon-scale training
    iters_per_block = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    decoder = os.environ.get("PPO_DECODER", "sigmoid")
    _, params = make_env(cohort_names(B), batch=True, dtype=np.float32)
    from simglucose_tpu.params import load_quest_params

    # the residual_bb decoder reads the Quest CR/CF planes in-kernel;
    # pack them unconditionally (sigmoid configs ignore them)
    quest = load_quest_params(cohort_names(B), dtype=np.float32)
    packed = pack_params(params.patient, basal_rate(params.patient),
                         quest=quest)
    key = jax.random.PRNGKey(int(os.environ.get("PPO_SEED", 0)))
    lr = float(os.environ.get("PPO_LR", 3e-4))
    ent = float(os.environ.get("PPO_ENT", 1e-3))
    ils = float(os.environ.get("PPO_INIT_LOG_STD", -0.5))
    # action = sigmoid(raw) * action_scale * patient_basal (the kernel's
    # nn_scale_by_basal config): 10x the patient's own basal covers BB-bolus
    # intensity while one policy output means the same therapy intensity
    # across the cohort's ~6x basal span.  The -2.2 cold-start bias lands
    # the initial action AT ~1x basal — the clinically neutral start.
    scale = float(os.environ.get("PPO_ACTION_SCALE", 10.0))
    lam = float(os.environ.get("PPO_LAM", 0.98))
    gamma = float(os.environ.get("PPO_GAMMA", 0.99))
    hypo_w = float(os.environ.get("PPO_HYPO_W", 3.0))
    barrier_w = float(os.environ.get("PPO_BARRIER", 0.15))
    # reward scale: the CONTINUING objective has no terminals, so value
    # targets are ~reward/(1-gamma*lam) — at gamma .995 that is ~50x the
    # per-step reward, and the value head's large-scale regression drags
    # the SHARED trunk (measured: train reward degrades monotonically
    # after ~1e8 steps without this).  Advantage normalization makes the
    # policy gradient scale-invariant, so scaling rewards to O(1) returns
    # only tames the value loss.
    rew_scale = float(os.environ.get("PPO_REW_SCALE", 1.0))
    cfg = PPOConfig(
        rollout_steps=64, epochs=2, minibatches=4, ent_coef=ent, lr=lr,
        gamma=gamma, decoder=decoder,
        init_log_std=ils, action_scale=scale,
        scale_by_basal=decoder == "sigmoid",
        # insulin acts with a 30-60 min lag (10-20 steps at Dexcom cadence):
        # gamma*lam must keep the hypo consequence of an overdose inside the
        # GAE credit horizon, or training drifts toward over-dosing
        lam=lam,
        # learner as one fused pallas kernel per grad step (r4: 2.0 ms vs
        # 3.1 ms per iteration with the XLA learner)
        pallas_learner=True,
        shuffle_block=2048,
    )
    policy = init_policy(
        jax.random.fold_in(key, 1), hidden=HIDDEN, act="relu",
        init_log_std=cfg.init_log_std,
        # residual_bb: zero mean bias -> the fresh policy IS basal-bolus
        # therapy (exp(scale*tanh(0)) = 1); sigmoid: safe under-dosed start
        init_mu_bias=0.0 if decoder == "residual_bb" else -2.2,
        action_scale=cfg.action_scale, scale_by_basal=cfg.scale_by_basal,
        decoder=decoder,
    )
    # critic warm init: with the continuing objective the steady-state
    # value is ~mean_reward/(1 - gamma*lam); initializing b_v there keeps
    # the first policy updates from being driven by a wildly-wrong critic
    # (measured: the BB-prior residual policy dips hard in the first ~40
    # iterations while the critic converges)
    init_bv = os.environ.get("PPO_INIT_BV")
    if init_bv is not None:
        import dataclasses as _dc0
        import jax.numpy as _jnp0

        policy = _dc0.replace(
            policy, b_v=_jnp0.full((1,), float(init_bv), _jnp0.float32)
        )
    warm = os.environ.get("PPO_WARM_START")
    if warm:
        import dataclasses as _dc

        from simglucose_tpu.utils.checkpoint import restore_state

        policy = restore_state(warm, like=policy)
        # decoder rescale compensation: warm-starting into a LARGER
        # action_scale S' from a checkpoint trained at S keeps the
        # effective policy ~unchanged in the low-dose region by shifting
        # the mean bias (sigmoid(x) ~ e^x there): raw' = raw - ln(S'/S)
        shift = float(os.environ.get("PPO_BMU_SHIFT", 0.0))
        if shift:
            policy = _dc.replace(policy, b_mu=policy.b_mu + shift)
        print(f"warm start from {warm} (b_mu shift {shift:+.2f})",
              flush=True)
    ts = init_fused_state(policy, make_optimizer(cfg).init(policy), B, key)
    # CONTINUING-task training (rl/fused.py make_fused_train_step docs):
    # auto-reset off so a BG excursion keeps collecting its own bad rewards
    # instead of respawning healthy — the episodic form is exploitable
    # (reset farming: 92% hypo time while train reward improves)
    import jax.numpy as jnp

    from simglucose_tpu.analysis.risk import risk_scalar

    def hypo_weighted_reward(traj):
        # the Magni risk is nearly symmetric (BG 50 and BG 250 score the
        # same ~22), so a symmetric objective lets the learner trade hypo
        # for hyper freely — clinically wrong and, measured, an attractor
        # (hypo time grows monotonically).  Weight the hypo branch 3x, add
        # a soft barrier below 90 mg/dL (always-sloped even where the CGM
        # clamp at 39 flattens the risk), and clip high enough that the
        # floor is never the active constraint.
        cgm = traj["CGM"]
        lb, hb, _ = risk_scalar(cgm)
        barrier = barrier_w * jnp.maximum(90.0 - cgm, 0.0)
        return rew_scale * (
            -jnp.minimum(hb + hypo_w * lb, 400.0) / 10.0 - barrier
        )

    loop = jax.jit(
        make_fused_train_loop(
            cfg, B, iters_per_block, hidden=HIDDEN, reward_kind="neg_risk",
            continuing=True, reward_fn=hypo_weighted_reward,
            # the continuing config schedules ~1.2MB over the 16MB scoped
            # VMEM budget at the default t_chunk=16; halving the trajectory
            # block fits with headroom
            pallas_overrides=dict(t_chunk=8),
        ),
        donate_argnums=(1,),
    )

    # BB-dominance selection (VERDICT r4 item 6): the BB therapy baseline
    # at the SAME eval seed is the bar; prefer checkpoints that dominate
    # it (RI better AND TIR within 1% AND hypo no worse), best RI among
    # those; fall back to plain best-RI until one dominates.
    from simglucose_tpu import params as _tbl
    from simglucose_tpu.rl.evaluate import evaluate_controller as _ec

    tables_names = _tbl.patient_names
    bb = _ec("BB", tables_names(), hours=24.0, seed=999)
    bb_ri = float(bb["risk_index"].mean())
    bb_tir = float(bb["percent_in_70_180"].mean())
    bb_hypo = float(bb["percent_below_70"].mean())
    print(f"BB baseline (seed 999): RI {bb_ri:.3f} TIR {bb_tir:.1f}% "
          f"hypo {bb_hypo:.2f}%", flush=True)

    best_ri = float("inf")
    best_dom = False
    r0 = cohort_eval(policy)
    ri0 = float(r0["risk_index"].mean())
    print(f"iter 0: cohort RI {ri0:.3f} TIR {r0['percent_in_70_180'].mean():.1f}%",
          flush=True)

    import jax.numpy as jnp

    EVAL_EVERY = int(os.environ.get("PPO_EVAL_EVERY", 10))
    tic = time.time()
    for blk in range(n_blocks):
        # fresh episodes each block: new start hours / init BG / meal plans
        ts = ts._replace(init=jnp.int32(1))
        ts, m = loop(packed, ts)
        i = (blk + 1) * iters_per_block
        if (blk + 1) % EVAL_EVERY and blk + 1 != n_blocks:
            continue
        rew = float(np.asarray(m["reward_mean"])[-1])
        done = float(np.asarray(m["done_frac"])[-1])
        ent = float(np.asarray(m["entropy"])[-1])
        res = cohort_eval(ts.params)
        ri = float(res["risk_index"].mean())
        tir = float(res["percent_in_70_180"].mean())
        hypo = float(res["percent_below_70"].mean())
        dom = ri < bb_ri and tir >= bb_tir - 1.0 and hypo <= bb_hypo
        better = (
            (dom and not best_dom)
            or (dom == best_dom and ri < best_ri)
        )
        marker = ""
        if better:
            best_ri = ri
            best_dom = dom
            save_state(CKPT, jax.device_get(ts.params))
            marker = "  <- checkpoint" + (" (dominates BB)" if dom else "")
        print(
            f"iter {i:5d}: train rew {rew:+.4f} done {done:.4f} ent {ent:.3f}"
            f" | cohort RI {ri:.3f} TIR {tir:.1f}% hypo {hypo:.2f}%{marker}",
            flush=True,
        )
    wall = time.time() - tic
    print(json.dumps({
        "iters": n_blocks * iters_per_block,
        "env_steps": n_blocks * iters_per_block * B * 64,
        "wall_s": round(wall, 1),
        "ri_start": ri0,
        "ri_best": best_ri,
        "ckpt": os.path.abspath(CKPT),
    }))


if __name__ == "__main__":
    main()
