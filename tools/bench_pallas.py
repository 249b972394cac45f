#!/usr/bin/env python
"""Benchmark the pallas in-VMEM rollout kernel on the real TPU.

Usage: python tools/bench_pallas.py [B] [T] [block_rows] [t_chunk] [regen_every]
Prints env-steps/s with the same hard host-fetch barrier bench.py uses.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/simglucose_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from simglucose_tpu.envs.build import cohort_names, make_env
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.ops.pallas_rollout import (
        PallasRolloutConfig,
        make_pallas_rollout,
        pack_params,
    )

    args = [int(a) for a in sys.argv[1:]]
    B = args[0] if len(args) > 0 else 4096
    T = args[1] if len(args) > 1 else 256
    block_rows = args[2] if len(args) > 2 else 32
    t_chunk = args[3] if len(args) > 3 else 32
    regen_every = args[4] if len(args) > 4 else 8
    n_calls = int(os.environ.get("N_CALLS", "24"))

    _, params = make_env(cohort_names(B), batch=True, dtype=np.float32)
    packed = pack_params(params.patient, basal_rate(params.patient))
    packed = jax.device_put(packed)

    pcfg = PallasRolloutConfig(
        n_steps=T, block_rows=block_rows, t_chunk=t_chunk, controller="pid",
        regen_every=regen_every,
    )
    run = jax.jit(make_pallas_rollout(pcfg, B), static_argnums=())

    traj = run(packed, 0)
    _ = float(np.asarray(traj["reward"][-1])[0])  # drain pipeline

    tic = time.perf_counter()
    for i in range(n_calls):
        traj = run(packed, i + 1)
    final = np.asarray(traj["reward"][-1])  # hard fetch == true barrier
    toc = time.perf_counter()

    assert np.isfinite(final).all(), "non-finite rewards"
    sps = B * T * n_calls / (toc - tic)
    print(
        f"pallas B={B} T={T} R={block_rows} TC={t_chunk} K={regen_every}: "
        f"{sps / 1e6:.2f}M env-steps/s"
    )


if __name__ == "__main__":
    main()
