"""High-level simulation engine: the user-facing batch-simulation API.

Capability parity with the reference's sim engine + ``simulate()`` entry
(reference: simulation/sim_engine.py:15-76, simulation/user_interface.py:303-385),
re-designed TPU-first: the whole patient cohort runs as ONE compiled
``jit(vmap(scan))`` program instead of a process pool — "parallel" is the
default and costs nothing.

Main entry: :func:`simulate` — programmatic, returns the reference-style
multi-index results frame and optionally writes per-patient CSVs + the full
analysis report.  :class:`SimObj`/:func:`sim`/:func:`batch_sim` are thin
familiar shims over the same machinery.
"""
from __future__ import annotations

import logging
import os
import time
from datetime import datetime, timedelta
from typing import Callable, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from simglucose_tpu import params as tables
from simglucose_tpu.analysis.report import cohort_frame, report, trajectory_frame
from simglucose_tpu.analysis.risk import risk_diff_reward
from simglucose_tpu.controllers.functional import (
    BBParams,
    bb_params,
    bb_policy,
    pid_controller,
)
from simglucose_tpu.envs.build import make_env
from simglucose_tpu.envs.gym_env import MealSpec, parse_meal_times
from simglucose_tpu.envs.rollout import rollout_batch

logger = logging.getLogger(__name__)


class _FrameFields(NamedTuple):
    """The pytree shape trajectory_frame/cohort_frame consume."""

    BG: np.ndarray
    CGM: np.ndarray
    CHO: np.ndarray
    insulin: np.ndarray
    LBGI: np.ndarray
    HBGI: np.ndarray
    risk: np.ndarray


def _resolve_controller(controller, cfg, env_params, patient_names, dtype):
    """Accept 'BB'/'PID' (optionally with kwargs), a (ctrl_init, ctrl_fn)
    pair, or a pair factory.

    PID gains are configurable per run — the reference exposes P/I/D on the
    controller constructor (reference: controller/pid_ctrller.py:9-15):
    pass ``('PID', dict(P=..., I=..., D=..., target=...))`` or
    ``{'PID': {...}}``.  Likewise ``('BB', dict(target=...))``.

    Returns (ctrl_init, ctrl_fn, ctrl_in_axes)."""
    controller, kwargs = _controller_spec(controller)

    if controller is None or (
        isinstance(controller, str) and controller.upper() in ("BB", "BASAL-BOLUS")
    ):
        quest = tables.load_quest_params(patient_names, dtype=dtype)
        bb = bb_params(env_params.patient, quest)
        return bb, bb_policy(cfg.sample_time, **kwargs), 0
    if isinstance(controller, str) and controller.upper() == "PID":
        gains = dict(P=-1e-4, I=-1e-7, D=0.0)
        gains.update(kwargs)
        init, fn = pid_controller(cfg.sample_time, dtype=dtype, **gains)
        return init, fn, None
    if isinstance(controller, tuple) and len(controller) == 2:
        init, fn = controller
        return init, fn, None
    if isinstance(controller, tuple) and len(controller) == 3:
        # (init, policy, in_axes): per-patient controller state (e.g.
        # rl/evaluate.policy_controller with basal scaling)
        return controller
    raise ValueError(
        f"controller must be 'BB', 'PID' (optionally ('PID', kwargs) / "
        f"{{'PID': kwargs}}), an (init, policy) pair, or an "
        f"(init, policy, in_axes) triple; got {controller!r}"
    )


def _controller_spec(controller):
    """Normalize a controller spec to (name_or_None_or_object, kwargs)."""
    if isinstance(controller, dict) and len(controller) == 1:
        (name, kwargs), = controller.items()
        return name, dict(kwargs)
    if (
        isinstance(controller, tuple)
        and len(controller) == 2
        and isinstance(controller[0], str)
        and isinstance(controller[1], dict)
    ):
        return controller[0], dict(controller[1])
    return controller, {}


def _pallas_eligible(
    scenario, controller, animate, substeps, dtype, reward_fun
) -> Optional[str]:
    """None if the pallas single-kernel engine can run this config, else the
    reason it can't."""
    if scenario is not None and not (
        isinstance(scenario, str) and scenario == "random"
    ):
        # custom scenarios ride the kernel's static meal schedule
        # (scenario_kind='static', ops/pallas_rollout.py) as long as they
        # parse to the reference MealSpec forms (scenario.py:48-59)
        try:
            parse_meal_times(scenario, datetime(2018, 1, 1))
        except (TypeError, ValueError):
            return "an unparseable custom scenario"
    if animate:
        return "animate=True (incremental host rendering)"
    if substeps != 1:
        return f"substeps={substeps} (kernel is rk4/substeps=1)"
    if dtype != np.float32:
        return f"dtype={np.dtype(dtype).name} (kernel is float32)"
    # reward_fun is NOT a blocker: the results frame has no reward column
    # (reference schema, env.py:169-180) and the eligible controllers
    # (BB/PID) never read the reward, so any window-based reward_fun is
    # recomputed in XLA from the kernel's CGM planes after the rollout
    # (envs/functional.rewards_from_cgm) and attached as
    # ``df.attrs['reward']`` — identical to what the env path would emit
    # for the same CGM values.
    del reward_fun
    ctrl_name, ctrl_kwargs = _controller_spec(controller)
    # kwarg whitelist is PER CONTROLLER: BB accepts only 'target' (the XLA
    # path's bb_policy raises on P/I/D), so ('BB', {'P': ...}) must NOT be
    # deemed eligible and silently dropped — both engines must accept
    # exactly the same specs
    known_kw = {"BB": {"target"}, "BASAL-BOLUS": {"target"},
                "PID": {"P", "I", "D", "target"}}
    if not (
        ctrl_name is None
        or (
            isinstance(ctrl_name, str)
            and ctrl_name.upper() in known_kw
            and set(ctrl_kwargs) <= known_kw[ctrl_name.upper()]
        )
    ):
        return "a custom controller"
    if jax.default_backend() != "tpu":
        return f"backend {jax.default_backend()!r} (TPU hardware PRNG)"
    return None


_PALLAS_RUN_CACHE: dict = {}
_REWARD_JIT_CACHE: dict = {}
# Both caches pin compiled executables; a sweep over horizons / cohort
# sizes / controller gains must not grow process memory without bound, so
# insertion evicts the oldest entry beyond these sizes.
_PALLAS_CACHE_MAX = 16
_REWARD_CACHE_MAX = 32

# Longest single-call kernel horizon (env steps) the engine will compile.
# Measured bound: T=4096 (an 8.5-day Dexcom run) compiles and is the
# certified bench horizon, while a 30-day x 4096 single call FAILS over the
# remote-TPU tunnel (HTTP 413 compile-request size — BASELINE.md round-4).
# Longer horizons run as equal T=4096 chunks threading the kernel's
# persistent_state, bit-identical to the hypothetical single call (the
# kernel seeds its PRNG per (block, t-chunk) grid index, and chunk c
# passes seed + c * n_tchunks so the grid-index stream continues exactly
# where the previous call stopped).
PALLAS_MAX_STEPS_PER_CALL = 4096


def _cache_put(cache: dict, key, val, maxsize: int):
    while len(cache) >= maxsize:
        cache.pop(next(iter(cache)))
    cache[key] = val


def _pallas_horizon(n_steps: int):
    """(steps_per_call, n_calls) for a pallas horizon: one call when it
    fits the measured compile bound, else equal full-size chunks (the tail
    chunk's surplus steps are sliced off after the run — one compiled
    program instead of two)."""
    m = PALLAS_MAX_STEPS_PER_CALL
    if n_steps <= m:
        return n_steps, 1
    return m, -(-n_steps // m)


def _pallas_cfg(
    patient_names, cgm_name, insulin_pump_name, controller, n_steps,
    start_min, random_init_bg, start_time, scenario,
):
    """The kernel configuration simulate() would run this request with —
    shared by :func:`_simulate_pallas` and the auto-engine's compiled-probe
    so the two can NEVER drift (both build their cache key through
    :func:`_pallas_run_key` on this function's output).
    Returns (cfg, padded_batch, padded_names, n_dev, n_calls)."""
    from simglucose_tpu.ops.pallas_rollout import LANES, config_for_sensor

    n_dev = jax.device_count()
    B = len(patient_names)
    # pad the cohort to the kernel's lane width x device count (results
    # sliced back)
    unit = LANES * n_dev
    padded = B if B % unit == 0 else B + (unit - B % unit)
    names_p = [patient_names[i % B] for i in range(padded)]
    rows_per_dev = padded // LANES // n_dev
    block_rows = max(r for r in (32, 16, 8, 4, 2, 1) if rows_per_dev % r == 0)
    n_steps, n_calls = _pallas_horizon(n_steps)
    t_chunk = max(c for c in (32, 16, 8, 6, 5, 4, 3, 2, 1) if n_steps % c == 0)

    pump = tables.pump_record(insulin_pump_name)
    ctrl_name, ctrl_kwargs = _controller_spec(controller)
    ctrl_kind = (
        "pid"
        if (isinstance(ctrl_name, str) and ctrl_name.upper() == "PID")
        else "bb"
    )
    ctrl_fields = {}
    if ctrl_kind == "pid":
        gains = dict(P=-1e-4, I=-1e-7, D=0.0, target=140.0)
        gains.update(ctrl_kwargs)
        ctrl_fields = dict(
            pid_p=float(gains["P"]), pid_i=float(gains["I"]),
            pid_d=float(gains["D"]), pid_target=float(gains["target"]),
        )
    elif "target" in ctrl_kwargs:
        ctrl_fields = dict(bb_target=float(ctrl_kwargs["target"]))
    scenario_fields = {}
    if scenario is not None and not isinstance(scenario, str):
        # CustomScenario -> the kernel's static meal schedule (absolute
        # episode minutes; noise/init randomness unaffected) — the fast-path
        # analog of the reference CustomScenario (scenario.py:21-45)
        t_arr, a_arr = parse_meal_times(scenario, start_time)
        scenario_fields = dict(
            scenario_kind="static",
            det_meal_times=tuple(int(t) for t in t_arr),
            det_meal_amounts=tuple(float(a) for a in a_arr),
        )
    cfg = config_for_sensor(
        cgm_name,
        n_steps=n_steps,
        block_rows=block_rows,
        t_chunk=t_chunk,
        controller=ctrl_kind,
        # hw PRNG on real TPUs; the sw generator lets the engine run under
        # CPU interpret mode (tests) with the same stochastic laws
        prng="hw" if jax.default_backend() == "tpu" else "sw",
        **ctrl_fields,
        **scenario_fields,
        inc_basal=float(pump["inc_basal"]),
        min_basal=float(pump["min_basal"]),
        max_basal=float(pump["max_basal"]),
        inc_bolus=float(pump["inc_bolus"]),
        min_bolus=float(pump["min_bolus"]),
        max_bolus=float(pump["max_bolus"]),
        random_init_bg=random_init_bg,
        autoreset=False,
        fixed_start_min=start_min,
        # multi-call horizons thread the simulator state between calls
        persistent_state=n_calls > 1,
    )
    return cfg, padded, names_p, n_dev, n_calls


def _pallas_run_key(cfg, padded: int, n_dev: int, interpret: bool):
    """THE cache key for a compiled simulate() kernel — the auto-engine's
    compiled-probe and :func:`_cached_pallas_run` both call this, so the
    probe can never drift from the key the run would use."""
    return (cfg, padded, n_dev, interpret)


def _aot_cache_dir() -> str:
    """Directory for serialized compiled kernels (override with
    SIMGLUCOSE_TPU_AOT_CACHE; empty string disables the cache)."""
    return os.environ.get(
        "SIMGLUCOSE_TPU_AOT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "simglucose_tpu", "aot"),
    )


_KERNEL_SRC_HASH = None


def _kernel_src_hash() -> str:
    """Hash of the source files the compiled kernel is built from — part
    of the AOT cache key so a CODE change can never silently serve a stale
    executable (the config alone doesn't capture the kernel program)."""
    global _KERNEL_SRC_HASH
    if _KERNEL_SRC_HASH is None:
        import hashlib

        import simglucose_tpu.models.uva_padova as _uva
        import simglucose_tpu.ops.pallas_rollout as _pr

        h = hashlib.sha256()
        for mod in (_pr, _uva):
            try:
                with open(mod.__file__, "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(repr(mod).encode())
        _KERNEL_SRC_HASH = h.hexdigest()[:16]
    return _KERNEL_SRC_HASH


def _aot_path(cfg, padded: int, n_dev: int) -> Optional[str]:
    """Path of the serialized executable for this kernel config, keyed by
    everything that invalidates a compiled TPU binary: jax/jaxlib versions,
    the runtime's platform version (libtpu), device kind/count, the full
    kernel config, AND the kernel source hash.  None when the cache is
    disabled."""
    d = _aot_cache_dir()
    if not d:
        return None
    import hashlib

    try:
        platform_version = jax.devices()[0].client.platform_version
    except Exception:
        platform_version = "?"
    desc = repr((
        jax.__version__,
        getattr(jax, "_version", ""),
        platform_version,
        tuple(d_.device_kind for d_ in jax.devices()),
        cfg,
        padded,
        n_dev,
        _kernel_src_hash(),
    ))
    h = hashlib.sha256(desc.encode()).hexdigest()[:32]
    return os.path.join(d, f"kernel_{h}.jaxexec")


def _aot_payload_exists(cfg, padded: int, n_dev: int) -> bool:
    p = _aot_path(cfg, padded, n_dev)
    return p is not None and os.path.exists(p)


class _PallasRunner:
    """Callable around one simulate() kernel configuration with an
    ahead-of-time DISK cache of the compiled executable (VERDICT r4
    item 3: the jax persistent compile cache does not stabilize the pallas
    program hash across processes, so without this every fresh process
    paid the full multi-minute kernel compile).

    First use in a process either deserializes the executable from disk
    (``jax.experimental.serialize_executable`` — measured ~0.2 s vs ~4 min
    compile over the remote-TPU tunnel) or compiles once and serializes
    for the NEXT process.  Any AOT failure (version drift, unsupported
    backend, corrupt payload) falls back to the plain jit path and
    removes the stale payload.  Interpret mode and non-TPU backends skip
    AOT entirely."""

    def __init__(self, cfg, padded: int, n_dev: int, interpret: bool):
        self._cfg = cfg
        self._padded = padded
        self._n_dev = n_dev
        self._interpret = interpret
        self._fn = None  # the jitted builder output (lazy)
        self._compiled = None
        self._aot = (
            not interpret
            and jax.default_backend() == "tpu"
            and _aot_cache_dir() != ""
        )

    def _build(self):
        if self._fn is None:
            from simglucose_tpu.ops.pallas_rollout import (
                make_pallas_rollout,
                make_sharded_pallas_rollout,
            )

            if self._n_dev > 1:
                from simglucose_tpu.parallel.sharding import make_mesh

                mesh = make_mesh(dp=self._n_dev, tp=1)
                self._fn = jax.jit(
                    make_sharded_pallas_rollout(
                        self._cfg, self._padded, mesh,
                        interpret=self._interpret,
                    )
                )
            else:
                self._fn = jax.jit(
                    make_pallas_rollout(
                        self._cfg, self._padded, interpret=self._interpret
                    )
                )
        return self._fn

    def _args(self, packed, seed, state, init):
        seed = jnp.asarray(seed, jnp.int32)
        if self._cfg.persistent_state:
            init = jnp.asarray(0 if init is None else init, jnp.int32)
            return (packed, seed), dict(state=tuple(state), init=init)
        return (packed, seed), {}

    def _ensure_compiled(self, args, kwargs):
        """Load the executable from disk, or compile once and serialize."""
        from jax.experimental import serialize_executable as se

        path = _aot_path(self._cfg, self._padded, self._n_dev)
        if path is not None and os.path.exists(path):
            try:
                import pickle

                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                self._compiled = se.deserialize_and_load(
                    payload, in_tree, out_tree
                )
                logger.info("pallas kernel loaded from AOT cache: %s", path)
                return
            except Exception:
                logger.warning(
                    "stale/unreadable AOT payload %s — recompiling", path,
                    exc_info=True,
                )
                try:
                    os.remove(path)
                except OSError:
                    pass
        self._compiled = self._build().lower(*args, **kwargs).compile()
        if path is not None:
            try:
                import pickle

                payload, in_tree, out_tree = se.serialize(self._compiled)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump((payload, in_tree, out_tree), f)
                os.replace(tmp, path)
                logger.info("pallas kernel serialized to AOT cache: %s", path)
            except Exception:
                logger.warning("could not serialize kernel", exc_info=True)

    def __call__(self, packed, seed, state=None, init=None):
        if not self._aot:
            fn = self._build()
            kw = {}
            if state is not None:
                kw["state"] = state
            if init is not None:
                kw["init"] = init
            return fn(packed, seed, **kw)
        args, kwargs = self._args(packed, seed, state, init)
        if self._compiled is None:
            try:
                self._ensure_compiled(args, kwargs)
            except Exception:
                logger.warning(
                    "AOT path failed — falling back to jit", exc_info=True
                )
                self._aot = False
                return self(packed, seed, state=state, init=init)
        return self._compiled(*args, **kwargs)


def _cached_pallas_run(cfg, padded: int, n_dev: int, interpret: bool):
    """Process-cached kernel callable (a :class:`_PallasRunner`): without
    the process cache every simulate() call re-built the pallas_call and
    dispatched it EAGERLY — measured 38 s for a warm 30-patient day over
    the remote-TPU tunnel vs ~1 s compiled; without the runner's DISK
    cache every fresh process paid the full kernel compile (~4 min over
    the tunnel) — now a ~0.2 s executable load."""
    key = _pallas_run_key(cfg, padded, n_dev, interpret)
    fn = _PALLAS_RUN_CACHE.pop(key, None)
    if fn is not None:
        # true LRU: re-insert on hit so eviction drops the LEAST recently
        # used entry, not merely the oldest-inserted (a >N-config sweep
        # would otherwise evict exactly the entry about to be reused)
        _PALLAS_RUN_CACHE[key] = fn
    if fn is None:
        fn = _PallasRunner(cfg, padded, n_dev, interpret)
        _cache_put(_PALLAS_RUN_CACHE, key, fn, _PALLAS_CACHE_MAX)
    return fn


def _simulate_pallas(
    patient_names,
    cgm_name,
    insulin_pump_name,
    controller,
    n_steps,
    start_min,
    random_init_bg,
    seed,
    start_time,
    sample_time_check=None,
    interpret=False,
    scenario=None,
    reward_fun=risk_diff_reward,
):
    """Cohort simulation on the single-kernel in-VMEM pallas engine
    (~40x the XLA scan path; see ops/pallas_rollout.py).  Fixed horizon, no
    auto-reset — the reference batch_sim semantics (sim_engine.py:29-39).

    On multi-device backends the kernel runs under shard_map over a dp mesh
    (one kernel instance per chip, zero rollout communication —
    ops/pallas_rollout.py make_sharded_pallas_rollout).

    Horizons beyond ``PALLAS_MAX_STEPS_PER_CALL`` (the measured single-call
    compile bound) run as equal chunks threading the kernel's
    ``persistent_state`` — ONE compiled program reused across chunks, with
    per-chunk host gathering so device memory stays bounded by the chunk,
    not the horizon (the reference's sim_time is unbounded,
    sim_engine.py:29-39).  Chunked trajectories are BIT-identical to the
    hypothetical single call: the kernel's PRNG is seeded per (block,
    t-chunk) grid index and chunk c runs with ``seed + c * n_tchunks``, so
    the grid-index stream continues exactly where the previous call
    stopped (tests/test_sim_api.py chunked-parity test)."""
    from simglucose_tpu.analysis.risk import risk_scalar
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.ops.pallas_rollout import (
        LANES,
        NS_F,
        NS_I,
        pack_params,
    )

    B = len(patient_names)
    cfg, padded, names_p, n_dev, n_calls = _pallas_cfg(
        patient_names, cgm_name, insulin_pump_name, controller, n_steps,
        start_min, random_init_bg, start_time, scenario,
    )
    patient = tables.load_patient_params(names_p, dtype=np.float32)
    quest = tables.load_quest_params(names_p, dtype=np.float32)
    if sample_time_check is not None:
        assert cfg.sample_time == sample_time_check
    packed = pack_params(patient, basal_rate(patient), quest=quest)
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from simglucose_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(dp=n_dev, tp=1)
        packed = jax.device_put(
            packed, NamedSharding(mesh, P(None, "dp"))
        )
    runner = _cached_pallas_run(cfg, padded, n_dev, interpret)
    risk_fn = jax.jit(risk_scalar)
    plane_keys = ("BG", "CGM", "CHO", "insulin")
    if n_calls == 1:
        traj = runner(packed, seed)
        L, H, RI = risk_fn(traj["BG"])
        bg0, cgm0 = traj["BG0"], traj["CGM0"]
        planes = {k: np.asarray(traj[k]) for k in plane_keys}
        planes.update(LBGI=np.asarray(L), HBGI=np.asarray(H),
                      risk=np.asarray(RI))
    else:
        # state threads through ONE compiled program (explicit zero state +
        # traced init on the first call keeps the pytree signature — and
        # hence the compilation — identical across chunks)
        state = (
            jnp.zeros((NS_F, padded // LANES, LANES), jnp.float32),
            jnp.zeros((NS_I, padded // LANES, LANES), jnp.int32),
        )
        if n_dev > 1:
            # the chunk-0 zero state must carry the SAME sharding the
            # sharded runner's state outputs do (P(None, 'dp', None)) —
            # the AOT-compiled executable is lowered against chunk 0's
            # avals and does not reshard later chunks' inputs
            from jax.sharding import NamedSharding, PartitionSpec as P

            from simglucose_tpu.parallel.sharding import make_mesh

            shard = NamedSharding(make_mesh(dp=n_dev, tp=1), P(None, "dp", None))
            state = tuple(jax.device_put(s, shard) for s in state)
        n_tchunks = cfg.n_steps // cfg.t_chunk
        acc = {k: [] for k in
               plane_keys + ("LBGI", "HBGI", "risk")}
        bg0 = cgm0 = None
        for c in range(n_calls):
            traj = runner(
                packed, seed + c * n_tchunks, state=state,
                init=1 if c == 0 else 0,
            )
            state = (traj["state_f"], traj["state_i"])
            if c == 0:
                bg0, cgm0 = traj["BG0"], traj["CGM0"]
            L, H, RI = risk_fn(traj["BG"])
            for k in plane_keys:
                acc[k].append(np.asarray(traj[k]))
            acc["LBGI"].append(np.asarray(L))
            acc["HBGI"].append(np.asarray(H))
            acc["risk"].append(np.asarray(RI))
        planes = {
            k: np.concatenate(v, axis=0)[:n_steps] for k, v in acc.items()
        }
    L0, H0, R0 = risk_fn(bg0)
    # per-step rewards recomputed in XLA from the kernel's CGM planes with
    # the exact ring-buffer window law (envs/functional.rewards_from_cgm) —
    # this is what makes ANY window-based reward_fun pallas-eligible.
    # The jitted recompute is cached per (reward_fun, window): a fresh
    # lambda per call would re-trace the W-branch reward switch every
    # simulate() (measured ~2s at W=60).
    from simglucose_tpu.envs.functional import (
        reward_window_size,
        rewards_from_cgm,
    )

    W = reward_window_size(cfg.sample_time)
    rkey = (reward_fun, W)
    rfn = _REWARD_JIT_CACHE.get(rkey)
    if rfn is None:
        rfn = jax.jit(
            lambda c0, c: rewards_from_cgm(reward_fun, W, c0, c)
        )
        _cache_put(_REWARD_JIT_CACHE, rkey, rfn, _REWARD_CACHE_MAX)
    rewards = rfn(cgm0, planes["CGM"])

    host = lambda a: np.asarray(a)[..., :B]
    zeros = np.zeros(B, np.float32)
    traj_ns = _FrameFields(
        BG=host(planes["BG"]),
        CGM=host(planes["CGM"]),
        CHO=host(planes["CHO"]),
        insulin=host(planes["insulin"]),
        LBGI=host(planes["LBGI"]),
        HBGI=host(planes["HBGI"]),
        risk=host(planes["risk"]),
    )
    reset_ns = _FrameFields(
        BG=host(bg0),
        CGM=host(cgm0),
        CHO=zeros,
        insulin=zeros,
        LBGI=host(L0),
        HBGI=host(H0),
        risk=host(R0),
    )
    df = cohort_frame(
        reset_ns, traj_ns, patient_names, start_time, cfg.sample_time
    )
    df.attrs["reward"] = host(rewards)  # [T, B]
    return df


def simulate(
    sim_time: timedelta = timedelta(days=1),
    scenario: Optional[Union[str, MealSpec]] = None,
    scenario_seed: Optional[int] = None,
    controller=None,
    patient_names: Optional[Sequence[str]] = None,
    cgm_name: str = "Dexcom",
    cgm_seed: Optional[int] = None,
    insulin_pump_name: str = "Insulet",
    start_time: Optional[datetime] = None,
    save_path: Optional[str] = None,
    animate: bool = False,
    parallel: bool = True,  # accepted for API familiarity; always one program
    random_init_bg: bool = False,
    dtype=np.float32,
    substeps: int = 1,
    reward_fun: Callable = risk_diff_reward,
    engine: str = "auto",
    compat_mode: bool = False,
):
    """Run a closed-loop cohort simulation and return the results frame.

    The programmatic analog of the reference's top-level ``simulate``
    (reference: simulation/user_interface.py:303-385): builds one env per
    patient, runs them all closed-loop for ``sim_time``, writes per-patient
    CSVs and the analysis report under ``save_path``, and returns the
    (patient, Time) multi-indexed DataFrame.

    ``scenario``: None → random daily meal plans (per-patient);
    'random' → same; a list of (time, grams) → CustomScenario for all
    patients (times are hours-since-start floats, timedeltas, or datetimes,
    reference: simulation/scenario.py:48-59).

    ``engine``: 'xla' — the general ``jit(vmap(scan))`` path (any
    controller/reward/scenario, bit-level seed reproducibility via threefry);
    'pallas' — the single-kernel in-VMEM fast path (~1B env-steps/s/chip;
    BB/PID, random or custom meal scenarios, any window-based reward_fun,
    TPU only, law-level seed reproducibility via the TPU hardware PRNG —
    raises ValueError if the config needs the general path); 'auto' —
    pallas whenever eligible AND worth it: once a config's kernel is
    compiled in this process the kernel always wins (B=30 day: 1.0 s vs
    2.8 s warm, measured v5e), but a fresh kernel compile costs minutes
    over a remote runtime while the XLA engine cold-starts in seconds, so
    cold auto runs use the kernel only above ~2e8 total env-steps.
    Pass engine='pallas' to force the kernel (e.g. at the start of a
    sweep whose later calls reuse it).

    Both engines attach the per-step reward plane as
    ``df.attrs['reward']`` ([T, B]) — the reference frame schema has no
    reward column (env.py:169-180), so rewards ride alongside; on the
    pallas engine they are recomputed in XLA from the kernel's CGM planes
    with the exact ring-buffer window law
    (:func:`~simglucose_tpu.envs.functional.rewards_from_cgm`).

    ``compat_mode=True`` is the verification configuration: float64, rk45 at
    4 substeps/min, and MT19937-bit-exact CGM noise + meal scenario shared
    across the cohort exactly like the reference's simulate() (every patient
    gets the same cgm_seed sensor and a deepcopy of the same scenario,
    reference: simulation/user_interface.py:364-372).  Requires explicit
    ``cgm_seed`` (and ``scenario_seed`` for random scenarios); forces the
    XLA engine.  Output frames match a reference batch_sim run at the same
    seeds (tests/test_cohort_golden.py).
    """
    if compat_mode:
        if engine == "pallas":
            raise ValueError("compat_mode requires the XLA engine")
        engine = "xla"
        dtype = np.float64
        substeps = 4
        random_init_bg = False
        if cgm_seed is None:
            raise ValueError("compat_mode requires an explicit cgm_seed")
        if scenario_seed is None and (scenario is None or isinstance(scenario, str)):
            raise ValueError(
                "compat_mode with a random scenario requires scenario_seed"
            )
    if patient_names is None:
        patient_names = tables.patient_names()
    if isinstance(patient_names, str):
        patient_names = [patient_names]
    patient_names = list(patient_names)
    B = len(patient_names)
    if start_time is None:
        start_time = datetime(2018, 1, 1, 0, 0, 0)

    if engine not in ("auto", "xla", "pallas"):
        raise ValueError(f"engine must be 'auto', 'xla', or 'pallas'; got {engine!r}")
    blocker = _pallas_eligible(
        scenario, controller, animate, substeps, dtype, reward_fun
    )
    if engine == "pallas" and blocker is not None:
        raise ValueError(
            f"engine='pallas' cannot run this config ({blocker}); "
            "use engine='xla' or 'auto'"
        )
    # auto: measured wall-clock crossover (BASELINE.md round-4, v5e over
    # the remote tunnel).  Once compiled the kernel beats the XLA engine at
    # ANY cohort size (B=30 day: 1.0 s vs 2.8 s warm), so auto uses it
    # whenever this process has already compiled the config.  A FRESH
    # kernel compile is heavy (~2-4 min) while the XLA engine cold-starts
    # in ~5 s at 23M steps/s, so cold auto runs take the kernel only when
    # the XLA device time alone would dominate that compile
    # (B * n_steps >= 2e8, sweep/long-horizon territory); engine='pallas'
    # forces the kernel regardless.
    if engine == "auto" and blocker is None:
        n_steps_est = int(sim_time.total_seconds() // 60) // tables.sensor_sample_time(cgm_name)
        start_min_est = (start_time.hour * 60 + start_time.minute) % 1440
        cfg_p, padded_p, _, n_dev_p, _ = _pallas_cfg(
            patient_names, cgm_name, insulin_pump_name, controller,
            n_steps_est, start_min_est, random_init_bg, start_time, scenario,
        )
        # probe key built by the SAME helper _cached_pallas_run uses, with
        # the interpret flag the pallas run below would pass (its default).
        # A serialized executable on disk counts as compiled: a fresh
        # process loads it in ~0.2 s, so the kernel wins at any size.
        compiled = (
            _pallas_run_key(cfg_p, padded_p, n_dev_p, False)
            in _PALLAS_RUN_CACHE
        ) or _aot_payload_exists(cfg_p, padded_p, n_dev_p)
        if not compiled and B * n_steps_est < 2e8:
            blocker = (
                f"auto heuristic: cold kernel compile not amortized at "
                f"B*steps={B * n_steps_est:.2g} (< 2e8) — pass "
                "engine='pallas' to force the kernel"
            )
    if engine in ("pallas", "auto") and blocker is None:
        n_steps_p = int(sim_time.total_seconds() // 60) // tables.sensor_sample_time(cgm_name)
        seed = (0 if scenario_seed is None else int(scenario_seed)) * 1000003 + (
            0 if cgm_seed is None else int(cgm_seed)
        )
        tic = time.time()
        df = _simulate_pallas(
            patient_names,
            cgm_name,
            insulin_pump_name,
            controller,
            n_steps_p,
            (start_time.hour * 60 + start_time.minute) % 1440,
            random_init_bg,
            seed,
            start_time,
            scenario=scenario,
            reward_fun=reward_fun,
        )
        logger.info(
            "Simulation of %d patients x %s took %.3f s (pallas engine)",
            B, sim_time, time.time() - tic,
        )
        if save_path is not None:
            os.makedirs(save_path, exist_ok=True)
            for name in patient_names:
                df.loc[name].to_csv(os.path.join(save_path, f"{name}.csv"))
            report(df, save_path=save_path)
        return df

    custom_times = custom_amounts = None
    scenario_mode = "random"
    if scenario is not None and not isinstance(scenario, str):
        t_arr, a_arr = parse_meal_times(scenario, start_time)
        custom_times = np.broadcast_to(t_arr, (B,) + t_arr.shape)
        custom_amounts = np.broadcast_to(
            a_arr.astype(dtype), (B,) + a_arr.shape
        )
        scenario_mode = "custom"

    noise_seq = meal_seq = None
    method = "rk4"
    if compat_mode:
        # MT19937-bit-exact pregeneration, shared across the cohort like the
        # reference (same cgm_seed sensor + deepcopied scenario per patient,
        # user_interface.py:364-372)
        from simglucose_tpu.compat.noise import reference_cgm_noise
        from simglucose_tpu.compat.scenario import reference_meal_seq

        method = "rk45"
        st = tables.sensor_sample_time(cgm_name)
        n_min = int(sim_time.total_seconds() // 60)
        noise_seq = reference_cgm_noise(
            tables.sensor_record(cgm_name), int(cgm_seed), n_min // st + 4
        )
        if scenario_mode == "random":
            meal_seq = reference_meal_seq(
                int(scenario_seed), start_time, n_min + st
            )
            scenario_mode = "exogenous"

    cfg, env_params = make_env(
        patient_names,
        sensor=cgm_name,
        pump=insulin_pump_name,
        dtype=dtype,
        batch=True,
        substeps=substeps,
        method=method,
        noise_seq=noise_seq,
        meal_seq=meal_seq,
        scenario_mode=scenario_mode,
        random_init_bg=random_init_bg,
    )
    if custom_times is not None:
        env_params = env_params._replace(
            custom_times=jnp.asarray(custom_times, jnp.int32),
            custom_amounts=jnp.asarray(custom_amounts),
        )

    ctrl_init, ctrl_fn, ctrl_axes = _resolve_controller(
        controller, cfg, env_params, patient_names, dtype
    )
    # reference-style 1-arg reward fns get exact variable-length semantics
    from simglucose_tpu.envs.functional import wrap_reward_fn

    reward_fun = wrap_reward_fn(reward_fun, cfg.window_size)

    n_steps = int(sim_time.total_seconds() // 60) // cfg.sample_time
    seed = 0 if scenario_seed is None else int(scenario_seed)
    base = jax.random.PRNGKey(seed)
    if cgm_seed is not None:
        base = jax.random.fold_in(base, int(cgm_seed))
    keys = jax.random.split(base, B)
    start_min = (start_time.hour * 60 + start_time.minute) % 1440

    tic = time.time()
    if animate:
        df = _simulate_animated(
            cfg, env_params, ctrl_init, ctrl_fn, ctrl_axes, keys, n_steps,
            start_min, reward_fun, patient_names, start_time,
        )
    else:
        # pregen (hoisting the noise/meal streams out of the scan,
        # envs/rollout.py) is bit-identical but measured SLOWER on TPU
        # (7-9M vs 23M steps/s at B=4096 — the scan-xs feeding costs more
        # than the per-step RNG it removes; the XLA body is bound by fusion
        # scheduling, not by the stream draws) and only ~8% faster on CPU.
        # Keep the general streaming path; the pallas kernel is the fast
        # path (sim/engine.py _pallas_eligible).
        pregen = False
        run = jax.jit(
            lambda p, k, ci: rollout_batch(
                cfg,
                p,
                k,
                ci,
                ctrl_fn,
                n_steps,
                start_min=start_min,
                reward_fun=reward_fun,
                ctrl_in_axes=ctrl_axes,
                pregen=pregen,
            )
        )
        state, reset_res, traj = run(env_params, keys, ctrl_init)
        jax.block_until_ready(traj.BG)
        # [B, T] -> [T, B] for the frame builder
        traj_tb = jax.tree.map(lambda a: np.asarray(a).swapaxes(0, 1), traj)
        df = cohort_frame(
            reset_res, traj_tb, patient_names, start_time, cfg.sample_time
        )
        df.attrs["reward"] = np.asarray(traj_tb.reward)  # [T, B]
    toc = time.time()
    logger.info(
        "Simulation of %d patients x %s took %.3f s (one compiled program)",
        B,
        sim_time,
        toc - tic,
    )

    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        for name in patient_names:
            df.loc[name].to_csv(os.path.join(save_path, f"{name}.csv"))
        report(df, save_path=save_path)
    return df


def _simulate_animated(
    cfg,
    env_params,
    ctrl_init,
    ctrl_fn,
    ctrl_axes,
    keys,
    n_steps,
    start_min,
    reward_fun,
    patient_names,
    start_time,
):
    """Chunked rollout with incremental rendering (the reference's live
    animation, env.py:157-167): run ~1-hour compiled chunks, redraw the
    first few patients' Viewers after each chunk."""
    from simglucose_tpu.analysis.rendering import Viewer
    from simglucose_tpu.envs.rollout import (
        batch_reset,
        broadcast_ctrl_state,
        make_batch_continue_fn,
    )

    B = len(patient_names)
    state, reset_res = batch_reset(cfg, env_params, keys, start_min=start_min)
    if ctrl_axes is None:
        ctrl_state = broadcast_ctrl_state(ctrl_init, B)
    else:
        ctrl_state = ctrl_init
    chunk = max(60 // cfg.sample_time, 1)
    run = make_batch_continue_fn(cfg, ctrl_fn, chunk, reward_fun=reward_fun)

    viewers = [Viewer(start_time, n) for n in patient_names[:4]]
    pieces = []  # [T, B] StepResult chunks
    last = reset_res
    done_steps = 0
    while done_steps < n_steps:
        state, ctrl_state, last, traj = run(env_params, state, ctrl_state, last)
        n_take = min(chunk, n_steps - done_steps)
        traj = jax.tree.map(lambda a: np.asarray(a)[:n_take], traj)
        pieces.append(traj)
        done_steps += n_take
        df_sofar = cohort_frame(
            reset_res,
            jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *pieces),
            patient_names,
            start_time,
            cfg.sample_time,
        )
        for v in viewers:
            v.render(df_sofar.loc[v.patient_name])
    for v in viewers:
        v.close()
    full = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *pieces)
    df = cohort_frame(
        reset_res, full, patient_names, start_time, cfg.sample_time
    )
    df.attrs["reward"] = np.asarray(full.reward)  # [T, B]
    return df


class SimObj:
    """Familiar OO shim over one patient's simulation
    (reference: simulation/sim_engine.py:15-49)."""

    def __init__(
        self,
        patient_name: str,
        controller=None,
        sim_time: timedelta = timedelta(days=1),
        start_time: Optional[datetime] = None,
        scenario: Optional[MealSpec] = None,
        seed: int = 0,
        animate: bool = False,
        path: Optional[str] = None,
        **kwargs,
    ):
        self.patient_name = patient_name
        self.controller = controller
        self.sim_time = sim_time
        self.start_time = start_time or datetime(2018, 1, 1)
        self.scenario = scenario
        self.seed = seed
        self.animate = animate
        self.path = path
        self.kwargs = kwargs
        self._results = None

    def simulate(self):
        df = simulate(
            sim_time=self.sim_time,
            scenario=self.scenario,
            scenario_seed=self.seed,
            controller=self.controller,
            patient_names=[self.patient_name],
            start_time=self.start_time,
            animate=self.animate,
            **self.kwargs,
        )
        self._results = df.loc[self.patient_name]
        return self._results

    def results(self):
        if self._results is None:
            self.simulate()
        return self._results

    def save_results(self):
        if self.path is None:
            raise ValueError("SimObj.path not set")
        os.makedirs(self.path, exist_ok=True)
        self.results().to_csv(
            os.path.join(self.path, f"{self.patient_name}.csv")
        )


def sim(sim_object: SimObj):
    """Run one SimObj (reference: sim_engine.py:56-62)."""
    logger.info("Simulating %s", sim_object.patient_name)
    res = sim_object.simulate()
    if sim_object.path is not None:
        sim_object.save_results()
    return res


def batch_sim(sim_instances: Sequence[SimObj], parallel: bool = False):
    """Run a batch of SimObjs (reference: sim_engine.py:65-76).

    When every instance shares (controller type, sim_time, start, scenario,
    seed), the whole batch is fused into ONE compiled cohort program;
    otherwise they run sequentially (each still a compiled program).
    ``parallel`` is accepted for API familiarity — on TPU the fused path is
    always parallel.
    """
    tic = time.time()
    fuse_key = lambda o: (
        type(o.controller).__name__
        if not isinstance(o.controller, (str, type(None)))
        else o.controller,
        o.sim_time,
        o.start_time,
        None if o.scenario is None else tuple(map(tuple, o.scenario)),
        o.seed,
        tuple(sorted(o.kwargs.items())),
    )
    results = []
    if len(sim_instances) > 1 and len({fuse_key(o) for o in sim_instances}) == 1:
        o0 = sim_instances[0]
        df = simulate(
            sim_time=o0.sim_time,
            scenario=o0.scenario,
            scenario_seed=o0.seed,
            controller=o0.controller,
            patient_names=[o.patient_name for o in sim_instances],
            start_time=o0.start_time,
            **o0.kwargs,
        )
        for o in sim_instances:
            o._results = df.loc[o.patient_name]
            if o.path is not None:
                o.save_results()
            results.append(o._results)
    else:
        results = [sim(o) for o in sim_instances]
    logger.info("Simulation took %.3f sec.", time.time() - tic)
    return results
