#!/usr/bin/env python
"""Device-time breakdown of one fused-PPO iteration (VERDICT r3 item 2).

Times the scanned fused train loop (rl/fused.py) in truncated-stage
variants to decompose the ~milliseconds iteration:

  rollout          — pallas 'nn' kernel + persistent-state carry only
  forward          — + featurize / logp-value forwards / GAE (no update)
  full             — the real training step
  learner          = full - forward      (epochs x minibatch grad steps)
  fwd+GAE          = forward - rollout

plus learner-shape variants ((epochs, minibatches) grids) to split the
learner into per-epoch (shuffle) and per-minibatch (grad step) costs.

Run ON TPU (the default backend); the axon tunnel flakes, so wrap in
``timeout``.  Usage: python tools/profile_fused_ppo.py [quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/simglucose_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8192
T = 64
ITERS = 128
HIDDEN = 64


def build(cfg, stages="full", **kw):
    from simglucose_tpu.rl.fused import init_fused_state, make_fused_train_loop
    from simglucose_tpu.rl.policy import init_policy
    from simglucose_tpu.rl.ppo import make_optimizer

    key = jax.random.PRNGKey(0)
    policy = init_policy(
        jax.random.fold_in(key, 1), hidden=HIDDEN, act="relu",
        init_log_std=cfg.init_log_std, init_mu_bias=-2.2,
    )
    ts = init_fused_state(policy, make_optimizer(cfg).init(policy), B, key)
    loop = jax.jit(
        make_fused_train_loop(
            cfg, B, ITERS, hidden=HIDDEN, stages=stages, **kw
        ),
        donate_argnums=(1,),
    )
    return loop, ts


def time_loop(loop, packed, ts, rounds=2):
    ts, m = loop(packed, ts)  # compile + pipeline drain
    _ = float(np.asarray(m["reward_mean"][-1]))
    best = float("inf")
    for _ in range(rounds):
        tic = time.perf_counter()
        ts, m = loop(packed, ts)
        _ = float(np.asarray(m["reward_mean"][-1]))  # hard fetch barrier
        best = min(best, (time.perf_counter() - tic) / ITERS)
    return best * 1e3  # ms / iteration


def main():
    from simglucose_tpu.envs.build import cohort_names, make_env
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.ops.pallas_rollout import pack_params
    from simglucose_tpu.rl.ppo import PPOConfig

    import dataclasses

    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    _, params = make_env(cohort_names(B), batch=True, dtype=np.float32)
    packed = jax.device_put(pack_params(params.patient, basal_rate(params.patient)))

    base = PPOConfig(rollout_steps=T, epochs=2, minibatches=4)
    rows = []

    def run(tag, cfg, stages, **kw):
        loop, ts = build(cfg, stages, **kw)
        ms = time_loop(loop, packed, ts)
        rows.append((tag, ms))
        print(f"{tag:40s} {ms:7.3f} ms/iter "
              f"({B * T / ms * 1e3 / 1e6:8.1f} M steps/s)", flush=True)
        return ms

    pal = dataclasses.replace(base, pallas_learner=True, shuffle_block=2048)

    ms_roll = run("rollout (kernel only)", base, "rollout")
    ms_fwd = run("rollout+forward+GAE", base, "forward")
    ms_full = run("full (e=2, mb=4)", base, "full")
    print(f"{'-> fwd+GAE':40s} {ms_fwd - ms_roll:7.3f} ms")
    print(f"{'-> learner (8 grad steps)':40s} {ms_full - ms_fwd:7.3f} ms")
    run(
        "full pallas learner (plane prep)", pal, "full", kernel_prep=False
    )
    # the kernel-prep pipeline (VERDICT r4 item 1): learner rows emitted by
    # the rollout kernel; only GAE + adv/ret pack between the two kernels
    ms_kroll = run("kprep rollout (emit rows)", pal, "rollout")
    ms_kfwd = run("kprep rollout+GAE", pal, "forward")
    ms_kfull = run("kprep full", pal, "full")
    print(f"{'-> kprep GAE+pack':40s} {ms_kfwd - ms_kroll:7.3f} ms")
    print(f"{'-> kprep learner (8 grad steps)':40s} "
          f"{ms_kfull - ms_kfwd:7.3f} ms")
    for tc in (4, 16):
        try:
            run(
                f"kprep full t_chunk={tc}", pal, "full",
                pallas_overrides=dict(t_chunk=tc),
            )
        except Exception as e:
            print(f"kprep t_chunk={tc}: {type(e).__name__}: {e}"[:120],
                  flush=True)

    if not quick:
        ms_e1 = run("full (e=1, mb=4)", dataclasses.replace(base, epochs=1), "full")
        ms_m1 = run("full (e=2, mb=1)", dataclasses.replace(base, minibatches=1), "full")
        ms_e1m1 = run(
            "full (e=1, mb=1)",
            dataclasses.replace(base, epochs=1, minibatches=1),
            "full",
        )
        print(f"{'-> per-epoch (shuffle+4mb)':32s} {ms_full - ms_e1:7.3f} ms")
        print(f"{'-> 6 extra minibatches':32s} {ms_full - ms_m1:7.3f} ms")
        print(f"{'-> minimal learner (1 step)':32s} {ms_e1m1 - ms_fwd:7.3f} ms")


if __name__ == "__main__":
    main()
