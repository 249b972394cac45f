#!/usr/bin/env python
"""Measure the general XLA rollout paths on TPU: streaming vs pregen
(fixed-horizon) and autoreset scan-unroll variants.

The fixed-horizon engine is simulate()'s XLA path (the reference's
batch_sim hot loop, sim_engine.py:33-37,65-76); the autoreset engine is
the RL/bench path.  Used to calibrate bench.py's XLA numbers and the
BASELINE.md table.
"""
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/simglucose_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from simglucose_tpu.controllers.functional import pid_controller  # noqa: E402
from simglucose_tpu.envs.build import cohort_names, make_env  # noqa: E402
from simglucose_tpu.envs.rollout import (  # noqa: E402
    batch_reset,
    broadcast_ctrl_state,
    make_batch_rollout_fn,
    rollout_batch,
)

B = 4096
T = 256


def timeit(fn, fetch, n_calls=8):
    fn()  # compile + warm
    fetch()
    tic = time.perf_counter()
    for _ in range(n_calls):
        out = fn()
    fetch(out)
    toc = time.perf_counter()
    return B * T * n_calls / (toc - tic)


def bench_fixed(pregen):
    cfg, params = make_env(
        cohort_names(B), batch=True, random_init_bg=True, dtype=np.float32
    )
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=-1e-4, I=-1e-7)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    run = jax.jit(
        lambda: rollout_batch(
            cfg, params, keys, ctrl0, ctrl, T, start_min=600, pregen=pregen
        )
    )
    out = [None]

    def fetch(o=None):
        o = o if o is not None else run()
        out[0] = float(np.asarray(o[2].reward)[0, -1])

    return timeit(run, fetch)


def bench_autoreset(reset_cadence=1):
    cfg, params = make_env(
        cohort_names(B), batch=True, random_init_bg=True, dtype=np.float32
    )
    ctrl0, ctrl = pid_controller(cfg.sample_time, P=-1e-4, I=-1e-7)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, reset_res = jax.jit(lambda p, k: batch_reset(cfg, p, k))(params, keys)
    cs = broadcast_ctrl_state(ctrl0, B)
    run = make_batch_rollout_fn(
        cfg, ctrl, n_steps=T, donate=False, reset_cadence=reset_cadence
    )

    def call():
        return run(params, state, cs, reset_res)

    def fetch(o=None):
        o = o if o is not None else call()
        return float(np.asarray(o[2].reward[-1])[0])

    return timeit(call, fetch)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fixed"):
        s = bench_fixed(pregen=False)
        print(f"fixed_streaming: {s/1e6:.2f}M steps/s", flush=True)
        s = bench_fixed(pregen=True)
        print(f"fixed_pregen:    {s/1e6:.2f}M steps/s", flush=True)
    if which in ("all", "autoreset"):
        s = bench_autoreset()
        print(f"autoreset:       {s/1e6:.2f}M steps/s", flush=True)
        for K in (16, 64):
            s = bench_autoreset(reset_cadence=K)
            print(f"autoreset K={K:3d}: {s/1e6:.2f}M steps/s", flush=True)


if __name__ == "__main__":
    main()
