"""Profiling & throughput instrumentation.

The reference only logs wall-clock per simulation
(reference: simulation/sim_engine.py:32,38-39,74-75).  Here throughput IS the
north-star metric, so this module makes it first-class: a `jax.profiler`
trace context for TensorBoard-able device traces, and a steps/sec meter used
by bench.py and the training loop.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str, host: bool = True) -> Iterator[None]:
    """Capture a device profile under ``logdir`` (view with TensorBoard or
    xprof).  Wrap exactly the steps you want traced."""
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Env-steps/sec meter with warmup exclusion.

    >>> meter = Throughput(batch=4096, steps_per_call=256)
    >>> meter.start(); run(); meter.stop(calls=4)
    >>> meter.steps_per_sec
    """

    def __init__(self, batch: int, steps_per_call: int):
        self.batch = batch
        self.steps_per_call = steps_per_call
        self._tic: Optional[float] = None
        self.elapsed = 0.0
        self.calls = 0

    def start(self):
        self._tic = time.perf_counter()

    def stop(self, calls: int = 1):
        if self._tic is None:
            raise RuntimeError("Throughput.stop() before start()")
        self.elapsed += time.perf_counter() - self._tic
        self.calls += calls
        self._tic = None

    @property
    def env_steps(self) -> int:
        return self.batch * self.steps_per_call * self.calls

    @property
    def steps_per_sec(self) -> float:
        return self.env_steps / self.elapsed if self.elapsed else float("nan")
