#!/usr/bin/env python
"""Headline benchmark: env-steps/s on one chip at a 4096-patient batch.

Config 3 of BASELINE.json: 4096 auto-resetting patients with native CGM
noise, random meal scenarios, risk-diff reward, PID controller, on the
default backend (TPU when available).  One env step = sample_time (3)
patient-minutes: pump quantization, scenario lookup, RK4 ODE integration,
CGM sampling, risk/reward/termination.

The headline path is the pallas in-VMEM rollout kernel
(simglucose_tpu/ops/pallas_rollout.py): the entire closed-loop simulator as
one TPU kernel, state resident in VMEM for the whole rollout.  Its
deterministic config matches the XLA env path exactly and its stochastic
config is distribution-validated against it (tests/test_pallas_rollout.py,
BASELINE.md).  If the pallas path is unavailable (e.g. non-TPU backend),
falls back to the general XLA scan path — same simulator semantics.

Measurement notes: over the remote-TPU (axon) tunnel, jax's
block_until_ready returns before execution completes, so the timed region
chains n_calls rollouts and ends with a HARD host fetch of a result
scalar — the fetch cannot complete until every chained execution has.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N/1e6, "path": "pallas"|"xla"}
vs_baseline is against the 1M env-steps/s/host north star (BASELINE.md).
"""
import json
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/simglucose_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 4096


def bench_pallas():
    """Fast path: full closed-loop simulator as one in-VMEM pallas kernel.

    On multi-chip backends the kernel runs under shard_map over a dp mesh —
    one kernel instance per chip, zero rollout communication; the global
    batch scales with the chip count at a fixed per-chip batch of 4096."""
    from simglucose_tpu.envs.build import cohort_names, make_env
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.ops.pallas_rollout import (
        PallasRolloutConfig,
        make_pallas_rollout,
        make_sharded_pallas_rollout,
        pack_params,
    )

    T = 4096
    n_calls = 24
    n_dev = jax.device_count()
    Bg = B * n_dev  # global batch: 4096 per chip

    _, params = make_env(cohort_names(Bg), batch=True, dtype=np.float32)
    packed = pack_params(params.patient, basal_rate(params.patient))
    pcfg = PallasRolloutConfig(
        n_steps=T, block_rows=32, t_chunk=32, controller="pid"
    )
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from simglucose_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(dp=n_dev, tp=1)
        packed = jax.device_put(packed, NamedSharding(mesh, P(None, "dp")))
        run = jax.jit(make_sharded_pallas_rollout(pcfg, Bg, mesh))
    else:
        packed = jax.device_put(packed)
        run = jax.jit(make_pallas_rollout(pcfg, Bg))

    traj = run(packed, 0)
    _ = float(np.asarray(traj["reward"][-1])[0])  # drain pipeline

    # two timed rounds, best-of (the axon tunnel adds sporadic multi-ms
    # stalls; the max is the sustained device rate)
    best = 0.0
    for r in range(2):
        tic = time.perf_counter()
        for i in range(n_calls):
            traj = run(packed, r * n_calls + i + 1)
        final = np.asarray(traj["reward"][-1])  # hard fetch == true barrier
        toc = time.perf_counter()
        assert np.isfinite(final).all()
        best = max(best, Bg * T * n_calls / (toc - tic))
    return best


def bench_xla():
    """General path: jit(vmap(scan(env_step))) rollout engine."""
    from simglucose_tpu.controllers.functional import pid_controller
    from simglucose_tpu.envs.build import cohort_names, make_env
    from simglucose_tpu.envs.rollout import (
        batch_reset,
        broadcast_ctrl_state,
        make_batch_rollout_fn,
    )

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

    state, last, traj = run(params, state, ctrl_state, reset_res)
    _ = float(np.asarray(traj.reward[-1])[0])

    tic = time.perf_counter()
    for _ in range(n_calls):
        state, last, traj = run(params, state, ctrl_state, last)
    final = np.asarray(traj.reward[-1])  # hard fetch == true barrier
    toc = time.perf_counter()

    assert np.isfinite(final).all()
    return B * T * n_calls / (toc - tic)


def main():
    path = "pallas"
    try:
        sps = bench_pallas()
    except Exception:  # non-TPU backend, Mosaic unavailable, ...
        path = "xla"
        sps = bench_xla()
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(sps),
                "unit": "steps/s",
                "vs_baseline": round(sps / 1e6, 3),
                "path": path,
            }
        )
    )


if __name__ == "__main__":
    main()
