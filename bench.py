#!/usr/bin/env python
"""Headline benchmark: env-steps/s on one chip at a 4096-patient batch.

Config 3 of BASELINE.json: 4096 vmapped auto-resetting patients with native
CGM noise, random meal scenarios, risk-diff reward, PID controller, on the
default backend (TPU when available).  One env step = sample_time (3)
patient-minutes: pump quantization, scenario lookup, RK4 ODE integration,
CGM sampling, risk/reward/termination.

Measurement notes: over the remote-TPU (axon) tunnel, jax's
block_until_ready returns before execution completes, so the timed region
chains n_calls donated rollouts and ends with a HARD host fetch of a result
scalar — the fetch cannot complete until every chained execution has.  The
~45 ms tunnel fetch latency is amortized over n_calls * T steps (<0.1%).

Prints ONE JSON line:
  {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N/1e6}
vs_baseline is against the 1M env-steps/s/host north star (BASELINE.md).
"""
import json
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/simglucose_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from simglucose_tpu.controllers.functional import pid_controller
    from simglucose_tpu.envs.build import cohort_names, make_env
    from simglucose_tpu.envs.rollout import (
        batch_reset,
        broadcast_ctrl_state,
        make_batch_rollout_fn,
    )

    B = 4096
    T = 256
    n_calls = 8

    cfg, params = make_env(
        cohort_names(B), batch=True, random_init_bg=True, dtype=np.float32
    )
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=-1e-4, I=-1e-7)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, reset_res = jax.jit(lambda p, k: batch_reset(cfg, p, k))(params, keys)
    ctrl_state = broadcast_ctrl_state(ctrl0, B)

    run = make_batch_rollout_fn(cfg, ctrl, n_steps=T, donate=True)

    # warmup / compile; the scalar fetch forces a full pipeline drain
    state, last, traj = run(params, state, ctrl_state, reset_res)
    _ = float(np.asarray(traj.reward[-1])[0])

    tic = time.perf_counter()
    for _ in range(n_calls):
        state, last, traj = run(params, state, ctrl_state, last)
    final = np.asarray(traj.reward[-1])  # hard fetch == true barrier
    toc = time.perf_counter()

    assert np.isfinite(final).all()
    steps = B * T * n_calls
    sps = steps / (toc - tic)
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(sps),
                "unit": "steps/s",
                "vs_baseline": round(sps / 1e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
