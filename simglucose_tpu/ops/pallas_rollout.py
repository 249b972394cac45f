"""Pallas fast path: the ENTIRE closed-loop rollout as one TPU kernel.

The XLA scan path tops out ~24M env-steps/s/chip regardless of batch size:
every env step crosses many fusion boundaries (scenario, 3 ODE minutes,
noise, risk, reset-merge), each a separate kernel whose state round-trips
HBM.  This kernel keeps the FULL simulator state in VMEM/registers for a
whole T-step rollout — per-step HBM traffic is only the trajectory outputs —
and runs the physics on lane-major [rows, 128] tiles via the same
:func:`simglucose_tpu.models.uva_padova.model_rhs_parts` physiology the env
path uses.

Scope (the high-throughput cohort-simulation configuration — the analog of
the reference's batch_sim use case, sim_engine.py:65-76):
  * rk4, substeps=1, f32, Dexcom-style static sample_time
  * native CGM noise law (AR(1) at the 15-min lattice -> Johnson-SU ->
    Catmull-Rom), driven by the TPU hardware PRNG instead of threefry
  * native random daily meal scenario law (same distributions as
    scenario/meal.py, reference scenario_gen.py:33-60)
  * gym-style auto-reset with random start hour + random initial BG
  * built-in controllers: PID (gains as static floats), basal-bolus therapy
    (per-patient Quest CR/CF planes), or constant basal
  * reward = risk_diff (reference env.py:27-33)

For custom controllers/rewards/sensors use the XLA path; both paths share
the same physics and parameter tables.  Statistical equivalence between the
two paths is asserted in tests/test_pallas_rollout.py; the deterministic
(no-noise/no-meal/no-reset) configuration must match env_step EXACTLY.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simglucose_tpu.core.types import PatientParams
from simglucose_tpu.models.uva_padova import EAT_RATE, model_rhs_parts

LANES = 128
MDL_SAMPLE_TIME = 15  # noise lattice spacing, min (noise_gen.py:17)
MINUTES_PER_DAY = 1440
_LOG_2PI = math.log(2.0 * math.pi)

# Meal-slot law (scenario/meal.py, reference scenario_gen.py:36-44)
_MEAL_PROB = (0.95, 0.3, 0.95, 0.3, 0.95, 0.3)
_TIME_LB = tuple(x * 60.0 for x in (5, 9, 10, 14, 16, 20))
_TIME_UB = tuple(x * 60.0 for x in (9, 10, 14, 16, 20, 23))
_TIME_MU = tuple(x * 60.0 for x in (7, 9.5, 12, 15, 18, 21.5))
_TIME_SIGMA = (60.0, 30.0, 60.0, 30.0, 60.0, 30.0)
_AMOUNT_MU = (45.0, 10.0, 70.0, 10.0, 80.0, 10.0)
_AMOUNT_SIGMA = (10.0, 5.0, 10.0, 5.0, 10.0, 5.0)

# Order of the packed per-patient parameter planes fed to the kernel:
# the 34 non-x0 PatientParams fields, then x0_1..x0_13, then
# (basal, CR, CF) — see pack_params().
_PARAM_FIELDS = [f for f in PatientParams._fields if f != "x0"]
NP_PLANES = len(_PARAM_FIELDS) + 13 + 3


@dataclasses.dataclass(frozen=True)
class PallasRolloutConfig:
    sample_time: int = 3
    n_steps: int = 256  # env steps per call
    block_rows: int = 32  # patients per block = block_rows * 128
    t_chunk: int = 32  # env steps per grid step (traj VMEM block)
    # sensor (Dexcom row of params/sensor_params.csv)
    pacf: float = 0.7
    gamma: float = -0.5444
    lam: float = 15.9574
    delta: float = 1.6898
    xi: float = -5.47
    cgm_min: float = 39.0
    cgm_max: float = 600.0
    # pump (Insulet row of params/pump_params.csv)
    inc_basal: float = 0.05
    min_basal: float = 0.0
    max_basal: float = 30.0
    inc_bolus: float = 0.05
    min_bolus: float = 0.0
    max_bolus: float = 30.0
    # controller: 'pid' | 'bb' | 'const' | 'nn'.  'nn' runs the Gaussian
    # MLP policy of rl/policy.py INSIDE the kernel (relu trunk, matmuls on
    # the MXU, action sampling from the in-kernel PRNG) — the pallas-fused
    # PPO actor (rl/fused.py).  Weights arrive as an extra input built by
    # :func:`pack_policy_weights`; the kernel additionally outputs the raw
    # pre-squash action and the controller's observation inputs so the
    # learner can recompute logp/value outside (one batched XLA forward).
    controller: str = "pid"
    nn_hidden: int = 64  # MLP width ('nn' controller); 64 or 128
    nn_action_scale: float = 0.2  # basal = sigmoid(raw) * scale (policy.py)
    # scale the 'nn' action by the patient's own basal rate (u2ss*BW/6000,
    # the plane pack_params already ships): basal = sigmoid(raw) * scale *
    # patient_basal — one policy output means the same THERAPY INTENSITY for
    # a 25 kg child and a 110 kg adult (cohort basals span ~6x).  The
    # deploy-side analog is policy_controller(..., basal=...) in
    # rl/evaluate.py.
    nn_scale_by_basal: bool = False
    # nn_sample_actions=False: the policy emits its MEAN action (raw = mu,
    # no Gaussian exploration) while the ENV stays stochastic (CGM noise,
    # random meals, resets) — the deployment/evaluation mode of a trained
    # policy (rl/evaluate.policy_controller's law) at kernel speed.
    nn_sample_actions: bool = True
    # nn_decoder='residual_bb': the policy MODULATES basal-bolus therapy
    # instead of emitting an absolute rate — insulin = quantize(bb_cmd *
    # exp(nn_action_scale * tanh(raw))) where bb_cmd is the per-patient
    # basal + announced-meal/correction bolus from the Quest CR/CF planes
    # (the same math as the 'bb' controller branch; reference
    # basal_bolus_ctrller.py:34-80).  A zero-output policy IS BB therapy;
    # bolus-sized doses are reachable (the absolute sigmoid decoder's
    # ceiling caps them — BASELINE.md round-5).  pack_params MUST be given
    # quest= for this config (the CR/CF planes default to ones otherwise).
    # nn_scale_by_basal is ignored; nn_action_scale is the log-range.
    nn_decoder: str = "sigmoid"
    # nn_batched_mlp=True: issue the policy trunk as ONE [H,7]x[7,R,128]
    # dot_general over all R sublane rows instead of R separate
    # [H,7]x[7,128] matmuls per step (VERDICT r3 item 5's MXU batching).
    # Same values; flag-gated so the per-row form remains measurable.
    nn_batched_mlp: bool = False
    # nn_emit_learner_rows=True: instead of the raw/octrl/oins/ocho/oprev/
    # oiob observation planes, the kernel emits the PPO learner's
    # feature-major buffer DIRECTLY — one [10, n_steps, rows, 128] output
    # whose rows are [0:7] the featurized observation, [7] the VALUE head
    # (the learner's forward nulls that row via its zero-padded w1 column),
    # [8] the raw pre-squash action, [9] the behavior log-prob — plus the
    # tail observation's value in the reset rows.  This removes the
    # XLA prep stage (featurize + logp/value forwards + pack) between the
    # rollout and the fused learner kernel entirely: after GAE (a [T, B]
    # associative scan) the learner gathers minibatches straight from this
    # buffer (ops/pallas_ppo_learner.ppo_grad_step_gather2).  The value
    # head rides the same in-kernel trunk as mu (one extra [H,1] read-out
    # per step); weights must come from pack_policy_weights (which always
    # ships w_v/b_v).
    nn_emit_learner_rows: bool = False
    # persistent_state=True: the full simulator state streams in/out of the
    # kernel as HBM arrays instead of living in per-call scratch, so
    # consecutive calls CONTINUE episodes (the PPO trainer's env-state carry
    # across iterations).  run() then takes (state_f, state_i, init) and
    # returns them updated; init=1 ignores the incoming state and draws
    # fresh episodes.
    persistent_state: bool = False
    pid_p: float = -1e-4
    pid_i: float = -1e-7
    pid_d: float = 0.0
    pid_target: float = 140.0
    bb_target: float = 140.0  # basal_bolus_ctrller.py:28 (default target)
    const_basal: float = 0.0
    # reward law: 'risk_diff' (the reference default, env.py:27-33) or
    # 'neg_risk' (dense -RI/10 — analysis/risk.py neg_risk_reward; the
    # per-episode-telescoping risk_diff is a near-zero-mean signal for RL,
    # see tests/test_ppo.py design notes)
    reward_kind: str = "risk_diff"
    # env
    bg_done_low: float = 70.0
    bg_done_high: float = 350.0
    random_init_bg: bool = True
    # autoreset=False: run fixed-horizon through BG excursions (the
    # reference's SimObj/batch_sim semantics — sim_engine.py:29-39 never
    # resets); done is still reported.
    autoreset: bool = True
    # >= 0: every lane starts at this minute-of-day (simulate()'s fixed
    # start_time); < 0: per-lane random start hour (gym semantics)
    fixed_start_min: int = -1
    # deterministic=True: no noise, no random meals, no resets, x0 init —
    # the exact-parity-vs-env_step test configuration.  det_meal_* give an
    # optional STATIC meal schedule (absolute episode minutes -> grams,
    # identical for every lane), the kernel analog of the env path's
    # exogenous meal_seq / the reference CustomScenario
    # (simulation/scenario.py:21-45) — exercises the eating state machine
    # and the BB bolus path under exact parity.
    deterministic: bool = False
    det_meal_times: tuple = ()
    det_meal_amounts: tuple = ()
    # scenario law for the STOCHASTIC config (ignored when deterministic):
    # 'random' — per-lane daily meal plans redrawn at midnight (the
    # reference RandomScenario, scenario_gen.py:10-73); 'static' — the
    # det_meal_times/det_meal_amounts schedule (absolute episode minutes),
    # i.e. a CustomScenario (scenario.py:21-45) WITH CGM noise / random
    # init BG / resets still active — this is how simulate() keeps custom
    # meal scenarios on the kernel fast path.  Under autoreset the schedule
    # replays from each new episode's minute 0.
    scenario_kind: str = "random"
    # 'hw': TPU hardware PRNG (fastest; real TPUs only).  'sw': counter-based
    # in-kernel generator (murmur-mix over lane/seed/call indices) — same
    # stochastic law, works in CPU interpret mode, so the stochastic kernel
    # path has CI coverage (tests/test_pallas_rollout.py).
    prng: str = "hw"
    # Rare-path sampling cadence: the day-rollover meal-plan redraw and the
    # auto-reset value draw run only on every regen_every-th unrolled step
    # instead of branchlessly every step (they are ~half the per-step
    # transcendental budget).  Deferring a midnight redraw is OBSERVATIONALLY
    # EXACT for up to 288 simulated minutes: meal-slot times all lie at
    # >= 300 min-of-day (reference scenario_gen.py:39, breakfast lower bound
    # 5 am), so neither the outgoing nor the incoming plan can fire during
    # the deferral window.  Reset draws are cached per lane at the same
    # cadence; a lane terminating twice within one window reuses its cached
    # draw (episodes ~125 steps at the default laws vs a window of
    # regen_every steps — negligible correlation).  Constraint:
    # regen_every * sample_time <= 288.  Set to 1 to restore per-step draws.
    regen_every: int = 8
    # exogenous_noise=True: CGM noise comes from caller-supplied planes
    # (reset_noise [2, rows, 128] + step_noise [n_steps, rows, 128]) indexed
    # exactly like the env path's EnvParams.noise_seq (devices/cgm.py) — 2
    # reset pops then one per step.  This is how the kernel is
    # golden-verified against the env path (and hence the reference,
    # sensor/noise_gen.py:15-69) with IDENTICAL noise, not just
    # distribution-matched.  Requires autoreset=False.
    exogenous_noise: bool = False


def config_for_sensor(sensor: str = "Dexcom", **overrides) -> "PallasRolloutConfig":
    """PallasRolloutConfig with the named sensor's parameter row (sample
    time, AR(1)/Johnson-SU noise constants, clamp range) filled in from the
    params table (params/sensor_params.csv — Dexcom/GuardianRT/Navigator)."""
    from simglucose_tpu.params import sensor_record

    rec = sensor_record(sensor)
    fields = dict(
        sample_time=int(rec["sample_time"]),
        pacf=float(rec["PACF"]),
        gamma=float(rec["gamma"]),
        lam=float(rec["lambda"]),
        delta=float(rec["delta"]),
        xi=float(rec["xi"]),
        cgm_min=float(rec["min"]),
        cgm_max=float(rec["max"]),
    )
    fields.update(overrides)
    return PallasRolloutConfig(**fields)


def pack_params(
    params: PatientParams, basal: jnp.ndarray, quest=None
) -> jnp.ndarray:
    """PatientParams [B] -> packed [NP_PLANES, rows, 128] planes.

    ``quest`` (any object with per-patient ``.CR``/``.CF`` arrays, e.g.
    :class:`simglucose_tpu.core.types.QuestParams`) is required for the
    configs that READ the Quest planes — ``controller='bb'`` and
    ``nn_decoder='residual_bb'``.  When quest is omitted those planes are
    filled with a finite ``-1.0`` sentinel that :func:`_unpack_params`
    converts to NaN inside the kernel, so a quest-reading config fails
    LOUDLY (NaN insulin/BG at the first meal or correction) instead of
    silently dosing with CR=CF=1 — meal-gram-sized insulin rates.  PID /
    const / sigmoid-decoder 'nn' configs never touch the planes.  The
    sentinel is finite (not NaN) on purpose: multi-process
    ``jax.device_put`` of the packed array onto a mesh sharding verifies
    the value is identical on every host with ``==``, and NaN != NaN
    would fail that check for hosts holding bit-identical arrays."""
    cols = [getattr(params, f) for f in _PARAM_FIELDS]
    cols += [params.x0[:, i] for i in range(13)]
    sentinel = jnp.full_like(jnp.asarray(basal, jnp.float32), -1.0)
    cols += [basal]
    cols += [quest.CR, quest.CF] if quest is not None else [sentinel, sentinel]
    flat = jnp.stack([jnp.asarray(c, jnp.float32) for c in cols])  # [NP, B]
    B = flat.shape[1]
    if B % LANES:
        raise ValueError(f"batch {B} must be a multiple of {LANES}")
    return flat.reshape(NP_PLANES, B // LANES, LANES)


def packed_basal(packed: jnp.ndarray) -> jnp.ndarray:
    """The per-patient basal plane of :func:`pack_params`, flattened back to
    [B] — the fused learner's featurize input (rl/policy.py
    featurize_parts needs the patient basal; the kernel reads the same
    plane in-kernel)."""
    return packed[len(_PARAM_FIELDS) + 13].reshape(-1)


def pack_policy_weights(params) -> jnp.ndarray:
    """PolicyParams (rl/policy.py) -> one [H, H+16] f32 buffer for the
    kernel's 'nn' controller.

    Column layout (H = hidden width, OBS_DIM = 7): [0:7] w1^T | [7] b1 |
    [8] w_mu | [9] rows 0/1/2 = (b_mu, log_std, b_v) | [10] w_v |
    [12:12+H] w2^T | [12+H] b2.  The value head (w_v at col 10, b_v at
    buf[2, 9]) feeds the ``nn_emit_learner_rows`` config, where the kernel
    computes values and log-probs in-kernel; plain 'nn' configs read only
    the policy-mean columns.

    The kernel's trunk is hardwired relu; params carrying any other static
    ``act`` metadata (rl/policy.py PolicyParams) are rejected so a
    tanh-trained checkpoint cannot silently run as a different network."""
    act = getattr(params, "act", "relu")
    if act != "relu":
        raise ValueError(
            f"the pallas 'nn' controller implements a relu trunk; got "
            f"params with act={act!r} (train/init the policy with "
            f"act='relu' to use the fused actor)"
        )
    H = params.b1.shape[0]
    if params.w1.shape[0] != 7:
        raise ValueError(
            f"the pallas 'nn' controller implements the OBS_DIM=7 featurizer "
            f"(rl/policy.py featurize_parts); got w1 with obs dim "
            f"{params.w1.shape[0]}"
        )
    buf = jnp.zeros((H, H + 16), jnp.float32)
    buf = buf.at[:, 0:7].set(params.w1.T.astype(jnp.float32))
    buf = buf.at[:, 7].set(params.b1.astype(jnp.float32))
    buf = buf.at[:, 8].set(params.w_mu[:, 0].astype(jnp.float32))
    buf = buf.at[0, 9].set(params.b_mu[0].astype(jnp.float32))
    buf = buf.at[1, 9].set(params.log_std[0].astype(jnp.float32))
    buf = buf.at[2, 9].set(params.b_v[0].astype(jnp.float32))
    buf = buf.at[:, 10].set(params.w_v[:, 0].astype(jnp.float32))
    buf = buf.at[:, 12:12 + H].set(params.w2.T.astype(jnp.float32))
    buf = buf.at[:, 12 + H].set(params.b2.astype(jnp.float32))
    return buf


def _unpack_params(pref, rs: slice) -> tuple:
    """Packed planes ref -> (PatientParams-like namespace of [R,128], x0 tuple,
    (basal, CR, CF))."""
    vals = {f: pref[i, rs] for i, f in enumerate(_PARAM_FIELDS)}
    n = len(_PARAM_FIELDS)
    x0 = tuple(pref[n + i, rs] for i in range(13))
    basal = pref[n + 13, rs]
    # pack_params fills CR/CF with a finite -1.0 sentinel when quest is
    # omitted (real Quest values are strictly positive); convert to NaN
    # here so quest-READING configs still poison their doses loudly while
    # the packed array itself stays NaN-free (multi-process device_put
    # compares hosts' values with ==, where NaN != NaN).  Dead code for
    # configs that never touch the planes.
    CR = pref[n + 14, rs]
    CF = pref[n + 15, rs]
    CR = jnp.where(CR > 0, CR, jnp.nan)
    CF = jnp.where(CF > 0, CF, jnp.nan)
    # PatientParams requires x0; give it a dummy (kernel never uses .x0)
    p = PatientParams(x0=x0[0], **vals)
    return p, x0, (basal, CR, CF)


# ---------------------------------------------------------------------------
# In-kernel RNG helpers
# ---------------------------------------------------------------------------


class _HwRng:
    """TPU hardware PRNG (fastest; no CPU interpret-mode lowering).
    ``pltpu.prng_seed`` must have been called before the first draw."""

    def bits(self, shape):
        # prng_random_bits yields int32 — bitcast to uint32 BEFORE shifting,
        # or the arithmetic shift drags sign bits into the exponent (NaNs)
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


class _SwRng:
    """Counter-based software PRNG: murmur3-finalizer mix over
    (seed, call counter, element index).

    The kernel body is fully unrolled at trace time, so each draw site gets
    a unique static counter; the per-(block, t_chunk) seed decorrelates grid
    steps exactly like the hw path's ``prng_seed`` call.  Statistically
    adequate for the simulator's noise/meal/reset laws (two fmix32 rounds);
    runs everywhere (VPU-friendly uint32 ops, CPU interpret mode included).
    """

    def __init__(self, seed):
        self._seed = seed.astype(jnp.uint32)
        self._n = 0

    def bits(self, shape):
        self._n += 1
        idx = jax.lax.broadcasted_iota(
            jnp.uint32, shape, 0
        ) * jnp.uint32(shape[1]) + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        x = idx * jnp.uint32(0x9E3779B9)
        x = x ^ (self._seed * jnp.uint32(0x85EBCA6B))
        x = x + jnp.uint32((self._n * 0x632BE59B) & 0xFFFFFFFF)
        for _ in range(2):  # murmur3 fmix32 x2
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
        return x


def _uniform(rng, shape):
    """U(0,1) in [1e-7, 1): random bits -> float via the exponent trick."""
    bits = rng.bits(shape)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-7)  # [1.0, 2.0) -> [1e-7, 1.0)


def _normal_pair(rng, shape):
    """Two N(0,1) draws per lane via Box-Muller."""
    u1 = _uniform(rng, shape)
    u2 = _uniform(rng, shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = (2.0 * math.pi) * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def _ndtri_central(p):
    """Central branch of Acklam's inverse-normal-CDF rational — no sqrt/log.

    Valid (|abs err| < 4e-8) for p in [0.0227, 0.9773] (the +/-2 sigma CDF
    window); used for the truncnorm meal-time draws whose CDF ranges are
    static per slot and known to fit (checked against scipy.ndtri)."""
    a = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
    b = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01)
    q = p - 0.5
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r) + 1.0
    return num * q / den


def _ndtri(p):
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — far below the f32 ulp)."""
    a = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
    b = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00)
    plow = 0.02425
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)

    # central region
    q = p - 0.5
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r) + 1.0
    x_c = num * q / den

    # lower tail
    ql = jnp.sqrt(-2.0 * jnp.log(p))
    num_l = ((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]
    den_l = (((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1.0
    x_l = num_l / den_l

    # upper tail (symmetry)
    qu = jnp.sqrt(-2.0 * jnp.log(1.0 - p))
    num_u = ((((c[0] * qu + c[1]) * qu + c[2]) * qu + c[3]) * qu + c[4]) * qu + c[5]
    den_u = (((d[0] * qu + d[1]) * qu + d[2]) * qu + d[3]) * qu + 1.0
    x_u = -num_u / den_u

    return jnp.where(p < plow, x_l, jnp.where(p > 1.0 - plow, x_u, x_c))


# ---------------------------------------------------------------------------
# In-kernel simulator pieces (all on [R, 128] tiles)
# ---------------------------------------------------------------------------


def _johnson(cfg: PallasRolloutConfig, x):
    # sinh via exp (Mosaic has no sinh lowering)
    z = (x - cfg.gamma) / cfg.delta
    ez = jnp.exp(z)
    return cfg.xi + cfg.lam * 0.5 * (ez - 1.0 / ez)


def _catmull(l0, l1, l2, l3, u):
    m1 = 0.5 * (l2 - l0)
    m2 = 0.5 * (l3 - l1)
    u2 = u * u
    u3 = u2 * u
    return (
        (2.0 * u3 - 3.0 * u2 + 1.0) * l1
        + (u3 - 2.0 * u2 + u) * m1
        + (-2.0 * u3 + 3.0 * u2) * l2
        + (u3 - u2) * m2
    )


def _quantize(amount, inc, lo, hi):
    """Pump quantization (reference actuator/pump.py:23-39)."""
    return jnp.clip(jnp.round(amount * 6000.0 / inc) * inc / 6000.0, lo, hi)


def _draw_meal_plan(cfg: PallasRolloutConfig, rng, shape):
    """One day's meal plan: (times[6 of shape], amounts[6 of shape]).

    This runs branchlessly EVERY env step (day rollovers are per-patient and
    desynchronize, so at batch>=1K some lane rolls over almost every step),
    so the draw is transcendental-lean: amount normals come from 3 Box-Muller
    pairs and the truncnorm times use the rational-only central inverse-CDF
    branch (their CDF windows are static +/-2 sigma; slot 5 spans +/-3 sigma
    and keeps the full 3-branch inverse)."""
    times, amounts = [], []
    amt_z = []
    for _ in range(3):
        z1, z2 = _normal_pair(rng, shape)
        amt_z += [z1, z2]
    for s in range(6):
        u_occ = _uniform(rng, shape)
        u_t = _uniform(rng, shape)
        mu, sig = _TIME_MU[s], _TIME_SIGMA[s]
        a_cdf = 0.5 * (1.0 + math.erf((_TIME_LB[s] - mu) / sig / math.sqrt(2.0)))
        b_cdf = 0.5 * (1.0 + math.erf((_TIME_UB[s] - mu) / sig / math.sqrt(2.0)))
        inv = _ndtri if min(a_cdf, 1.0 - b_cdf) < 0.0227 else _ndtri_central
        t = jnp.round(mu + sig * inv(a_cdf + u_t * (b_cdf - a_cdf)))
        amt = jnp.maximum(
            jnp.round(_AMOUNT_MU[s] + _AMOUNT_SIGMA[s] * amt_z[s]), 0.0
        )
        occurs = u_occ < _MEAL_PROB[s]
        times.append(jnp.where(occurs, t, -1.0))
        amounts.append(jnp.where(occurs, amt, 0.0))
    return times, amounts


def _rk4_minute(p, xs, d_mg, insulin_rate, Dbar):
    f = lambda ys: model_rhs_parts(ys, p, d_mg, insulin_rate, Dbar)
    add = lambda ys, ks, c: tuple(y + c * k for y, k in zip(ys, ks))
    k1 = f(xs)
    k2 = f(add(xs, k1, 0.5))
    k3 = f(add(xs, k2, 0.5))
    k4 = f(add(xs, k3, 1.0))
    return tuple(
        x + (1.0 / 6.0) * (a + 2.0 * b + 2.0 * c_ + d)
        for x, a, b, c_, d in zip(xs, k1, k2, k3, k4)
    )


def _fbg_risk(bg):
    logbg = jnp.log(jnp.maximum(bg, 1.0))
    f = 1.509 * (jnp.power(logbg, 1.084) - 5.381)
    return 10.0 * f * f * jnp.sign(f)  # signed risk: <0 hypo, >0 hyper


def _risk_of(bg):
    logbg = jnp.log(jnp.maximum(bg, 1.0))
    f = 1.509 * (jnp.power(logbg, 1.084) - 5.381)
    return 10.0 * f * f


# State plane indices in the f32 scratch (all [R, 128]):
#   0..12  ODE states
#   13 planned_meal  14 last_CHO  15 is_eating  16 last_Qsto  17 foodtaken
#   18 last_CGM      19 e         20..23 lattice
#   24..29 meal_times 30..35 meal_amounts
#   36 pid_integ     37 pid_prev  38 prev_CGM (for reward)
#   39 prev_CHO (previous step's averaged CHO — the BB controller's meal
#      announcement input, mirroring StepResult.CHO)
#   40 ctrl_prev (the observation the controller acts on — equals prev_CGM
#      except at episode start, where the env's reset draws TWO noise pops:
#      the history sample feeds the reward window and the obs sample feeds
#      the controller, env.py:126,142)
#   41..53 cached reset ODE states  54 cached reset e  55..58 cached reset
#      lattice (the auto-reset draw refreshed every regen_every steps)
#   59 cached reset CGM0  60 cached reset risk0 (derived from the cache —
#      avoids a clip+log+pow in every step's reset merge)
#   61 ins_prev — the previous step's delivered insulin (the 'nn'
#      controller's insulin observation feature, rl/policy.py
#      featurize; zeroed on reset like the autoreset carry's StepResult)
#   62 ctrl_pprev — the controller observation BEFORE ctrl_prev (the 'nn'
#      trend feature: tanh((ctrl_prev - ctrl_pprev)/10), rl/policy.py
#      featurize_parts; equals ctrl_prev at episode start -> zero trend)
#   63 iob — insulin-on-board, the exp(-dt/100min)-decayed sum of delivered
#      insulin (rl/policy.py iob_step); zeroed on reset
#   NOTE plane 38 carries risk(prev CGM), not the CGM itself: risk_diff
#   reuses the risk already computed when that CGM was produced.
NS_F = 64
#   int planes: 0 t_min (episode minutes)  1 start_min  2 day  3 seg
#   4 lattice_next  5 sample_count  6 cached reset start_min
NS_I = 7


def _reset_values(
    cfg: PallasRolloutConfig, rng, x0, shape, with_plan: bool = True
):
    """Fresh-episode state values (patient/sensor/scenario init).

    ``with_plan=False`` skips drawing a meal plan (the in-step auto-reset
    keeps the env's current plan: daily plans are i.i.d., so a new episode
    consuming the existing plan is the same law at ~40% less per-step math).
    """
    xs = list(x0)
    lattice_needed = not (cfg.deterministic or cfg.exogenous_noise)
    # 6 normals (3 init-BG + 3 noise-lattice) from exactly 3 Box-Muller pairs
    lat_z = None
    if not cfg.deterministic:
        if cfg.random_init_bg and lattice_needed:
            za, zb = _normal_pair(rng, shape)
            zc, zd = _normal_pair(rng, shape)
            ze, zf = _normal_pair(rng, shape)
            for idx, z in ((3, za), (4, zb), (12, zc)):
                mean = x0[idx]
                xs[idx] = mean + jnp.sqrt(0.1 * mean) * z
            lat_z = (zd, ze, zf)
        elif cfg.random_init_bg:
            za, zb = _normal_pair(rng, shape)
            zc, _ = _normal_pair(rng, shape)
            for idx, z in ((3, za), (4, zb), (12, zc)):
                mean = x0[idx]
                xs[idx] = mean + jnp.sqrt(0.1 * mean) * z
        elif lattice_needed:
            za, zb = _normal_pair(rng, shape)
            zc, _ = _normal_pair(rng, shape)
            lat_z = (za, zb, zc)
    zero = jnp.zeros(shape, jnp.float32)
    f = {
        "xs": tuple(xs),
        "planned": zero,
        "last_CHO": zero,
        "eating": zero,
        "last_Qsto": xs[0] + xs[1],
        "foodtaken": zero,
        "pid_integ": zero,
        "pid_prev": zero,
        "have_prev": zero,
    }
    # sensor lattice init (ops/noise.py:52-73)
    if lat_z is None:
        f["e"] = zero
        f["lat"] = (zero, zero, zero, zero)
    else:
        e0 = lat_z[0]
        e1 = cfg.pacf * (e0 + lat_z[1])
        e2 = cfg.pacf * (e1 + lat_z[2])
        f["e"] = e2
        j0 = _johnson(cfg, e0)
        f["lat"] = (j0, j0, _johnson(cfg, e1), _johnson(cfg, e2))
    # scenario plan for day 0
    if cfg.deterministic:
        f["meal_t"] = [jnp.full(shape, -1.0)] * 6
        f["meal_a"] = [zero] * 6
        f["start_min"] = jnp.zeros(shape, jnp.int32)
    else:
        if with_plan:
            if cfg.scenario_kind == "static":
                # custom schedule lives in cfg.det_meal_*; no plan draw
                f["meal_t"] = [jnp.full(shape, -1.0)] * 6
                f["meal_a"] = [zero] * 6
            else:
                mt, ma = _draw_meal_plan(cfg, rng, shape)
                f["meal_t"], f["meal_a"] = mt, ma
        if cfg.fixed_start_min >= 0:
            f["start_min"] = jnp.full(shape, cfg.fixed_start_min, jnp.int32)
        else:
            hour = jnp.floor(_uniform(rng, shape) * 24.0).astype(jnp.int32)
            f["start_min"] = hour * 60
    return f


def _make_kernel(cfg: PallasRolloutConfig, n_blocks: int):
    st = cfg.sample_time
    TC = cfg.t_chunk
    R = cfg.block_rows
    shape = (R, LANES)
    n_tchunks = cfg.n_steps // TC

    nn = cfg.controller == "nn"
    emit = nn and cfg.nn_emit_learner_rows

    def kernel(*refs):
        # inputs: seed, params, [wnn], [rnoise, noise], [state_f, state_i]
        # outputs: 6 traj planes, [raw/octrl/oins/ocho], rst,
        #          [state_f_out, state_i_out]  (persistent) | scratch fs/is_
        k = 2
        seed_ref, pref = refs[0], refs[1]
        wnn_ref = nns_ref = rnoise_ref = noise_ref = None
        sf_in = si_in = None
        if nn:
            wnn_ref, nns_ref = refs[k], refs[k + 1]
            k += 2
        if cfg.exogenous_noise:
            rnoise_ref, noise_ref = refs[k], refs[k + 1]
            k += 2
        if cfg.persistent_state:
            sf_in, si_in = refs[k], refs[k + 1]
            k += 2
        cgm_out, bg_out, rew_out, done_out, cho_out, ins_out = refs[k:k + 6]
        k += 6
        raw_out = octrl_out = oins_out = ocho_out = None
        oprev_out = oiob_out = lrn_out = None
        if emit:
            lrn_out = refs[k]  # [10, TC, R, 128] learner-row block
            k += 1
        elif nn:
            (raw_out, octrl_out, oins_out, ocho_out, oprev_out,
             oiob_out) = refs[k:k + 6]
            k += 6
        rst_out = refs[k]
        # persistent: the state OUTPUT refs are the working state; scratch
        # otherwise — either way the tail two refs
        fs, is_ = refs[k + 1], refs[k + 2]
        b = pl.program_id(0)
        t = pl.program_id(1)
        if cfg.deterministic:
            rng = None  # the exact-parity config never draws
        else:
            sv = seed_ref[0] + b * jnp.int32(1000003) + t
            if cfg.prng == "hw":
                # hw PRNG only lowers on real TPUs; 'sw' covers interpret mode
                pltpu.prng_seed(sv)
                rng = _HwRng()
            else:
                rng = _SwRng(sv)

        p, x0, (basal_rate_u, quest_CR, quest_CF) = _unpack_params(
            pref, slice(None)
        )

        if cfg.persistent_state:
            # continue prior episodes: pull the incoming state into the
            # working (output) refs, unless this is the init call
            @pl.when(jnp.logical_and(t == 0, seed_ref[1] == 0))
            def _carry_in():
                for i in range(NS_F):
                    fs[i] = sf_in[i]
                for i in range(NS_I):
                    is_[i] = si_in[i]

            init_cond = jnp.logical_and(t == 0, seed_ref[1] == 1)
        else:
            init_cond = t == 0

        @pl.when(init_cond)
        def _init():
            fvals = _reset_values(cfg, rng, x0, shape)
            for i in range(13):
                fs[i] = fvals["xs"][i]
            fs[13] = fvals["planned"]
            fs[14] = fvals["last_CHO"]
            fs[15] = fvals["eating"]
            fs[16] = fvals["last_Qsto"]
            fs[17] = fvals["foodtaken"]
            bg0 = fvals["xs"][12] / p.Vg
            if cfg.exogenous_noise:
                # the env's reset draws TWO noise pops (env.py:126,142):
                # [0] -> history row 0 / reward window, [1] -> the obs the
                # first controller call acts on
                cgm_hist0 = jnp.clip(
                    bg0 + rnoise_ref[0], cfg.cgm_min, cfg.cgm_max
                )
                cgm_obs0 = jnp.clip(
                    bg0 + rnoise_ref[1], cfg.cgm_min, cfg.cgm_max
                )
            elif cfg.deterministic:
                cgm_hist0 = cgm_obs0 = jnp.clip(bg0, cfg.cgm_min, cfg.cgm_max)
            else:
                # Catmull-Rom at tau=0 is exactly lat[1]
                cgm_hist0 = cgm_obs0 = jnp.clip(
                    bg0 + fvals["lat"][1], cfg.cgm_min, cfg.cgm_max
                )
            fs[18] = cgm_obs0  # ZOH value between samples
            # reset observation (the frame's row 0, reference env.py:119-134)
            rst_out[0] = bg0
            rst_out[1] = cgm_hist0
            fs[19] = fvals["e"]
            for i in range(4):
                fs[20 + i] = fvals["lat"][i]
            for i in range(6):
                fs[24 + i] = fvals["meal_t"][i]
                fs[30 + i] = fvals["meal_a"][i]
            fs[36] = fvals["pid_integ"]
            fs[37] = fvals["pid_prev"]
            # prev risk = risk(reset history sample); the first step's reward
            # is risk(reset CGM) - risk(step CGM), matching env_reset's
            # window = [CGM_hist0] + first-step window_len == 2 (env.py:126,100)
            fs[38] = _risk_of(cgm_hist0)
            fs[39] = jnp.zeros(shape, jnp.float32)  # prev_CHO
            fs[40] = cgm_obs0  # the first controller observation
            fs[61] = jnp.zeros(shape, jnp.float32)  # ins_prev
            fs[62] = cgm_obs0  # ctrl_pprev == ctrl_prev -> zero trend
            fs[63] = jnp.zeros(shape, jnp.float32)  # iob
            is_[0] = jnp.zeros(shape, jnp.int32)  # t_min
            is_[1] = fvals["start_min"]
            is_[2] = jnp.zeros(shape, jnp.int32)  # day
            is_[3] = jnp.zeros(shape, jnp.int32)  # seg
            is_[4] = jnp.full(shape, 3, jnp.int32)  # lattice_next
            is_[5] = jnp.zeros(shape, jnp.int32)  # sample_count (0 used at reset)
            # seed the auto-reset draw cache (refreshed every regen_every
            # steps in the step loop)
            rc = _reset_values(cfg, rng, x0, shape, with_plan=False)
            for i in range(13):
                fs[41 + i] = rc["xs"][i]
            fs[54] = rc["e"]
            for i in range(4):
                fs[55 + i] = rc["lat"][i]
            rc_cgm0 = jnp.clip(
                rc["xs"][12] / p.Vg + rc["lat"][1], cfg.cgm_min, cfg.cgm_max
            )
            fs[59] = rc_cgm0
            fs[60] = _risk_of(rc_cgm0)
            is_[6] = rc["start_min"]

        # ---- load state ----
        xs = tuple(fs[i] for i in range(13))
        planned, last_CHO, eating = fs[13], fs[14], fs[15]
        last_Qsto, foodtaken = fs[16], fs[17]
        last_CGM, e_ar = fs[18], fs[19]
        lat = [fs[20 + i] for i in range(4)]
        meal_t = [fs[24 + i] for i in range(6)]
        meal_a = [fs[30 + i] for i in range(6)]
        pid_integ, pid_prev = fs[36], fs[37]
        prev_risk = fs[38]
        prev_cho = fs[39]
        ctrl_prev = fs[40]
        ins_prev = fs[61]
        ctrl_pprev = fs[62]
        iob = fs[63]
        if nn:
            # per-lane featurization constants (rl/policy.py
            # featurize_parts): basal is static per patient, so the
            # divisions hoist out of the step loop
            inv3b = 1.0 / (3.0 * (basal_rate_u + 1e-8))
            inv120b = 1.0 / (120.0 * (basal_rate_u + 1e-8))
            f7 = jnp.tanh(20.0 * basal_rate_u)
            iob_decay = math.exp(-st / 100.0)  # iob_step, tau=100 min
            H = cfg.nn_hidden
            w1t = wnn_ref[:, 0:7]  # [H, 7]
            b1 = wnn_ref[:, 7:8]  # [H, 1]
            wmu = wnn_ref[:, 8:9]  # [H, 1]
            # b_mu / log_std / b_v come through SMEM: scalar->vector
            # broadcast is native there, while a [1,1] VMEM slice broadcast
            # to [R,128] is "broadcast in both sublanes and lanes"
            # (unimplemented in Mosaic)
            bmu_s = nns_ref[0]
            log_std_s = nns_ref[1]
            sigma_s = jnp.exp(log_std_s)
            w2t = wnn_ref[:, 12:12 + H]  # [H, H]
            b2 = wnn_ref[:, 12 + H:13 + H]  # [H, 1]
            if emit:
                wv = wnn_ref[:, 10:11]  # [H, 1] value head
                bv_s = nns_ref[2]
                inv_sigma = jnp.exp(-log_std_s)

            def nn_forward(feats):
                """Policy trunk on the MXU over all R sublane rows ->
                (mu [R,128], value [R,128] or None).  The value head is
                one extra [H,1] read-out of the shared trunk (emit mode
                only)."""
                if cfg.nn_batched_mlp:
                    # one batched trunk over all R rows: contract the
                    # feature axis, lanes = patients, rows ride a batch dim
                    obs_all = jnp.stack(feats, axis=0)  # [7, R, 128]
                    dn = (((1,), (0,)), ((), ()))
                    h = jnp.maximum(
                        jax.lax.dot_general(
                            w1t, obs_all, dimension_numbers=dn,
                            preferred_element_type=jnp.float32,
                        ) + b1[:, :, None],
                        0.0,
                    )  # [H, R, 128]
                    h = jnp.maximum(
                        jax.lax.dot_general(
                            w2t, h, dimension_numbers=dn,
                            preferred_element_type=jnp.float32,
                        ) + b2[:, :, None],
                        0.0,
                    )
                    mu = jnp.sum(h * wmu[:, :, None], axis=0) + bmu_s
                    v = (
                        jnp.sum(h * wv[:, :, None], axis=0) + bv_s
                        if emit else None
                    )
                else:
                    # [H,7]@[7,128] + [H,H]@[H,128] MXU pair per sublane
                    # row (lanes = patients, sublanes = hidden units)
                    mu_rows, v_rows = [], []
                    for r in range(R):
                        obs_r = jnp.stack(
                            [f[r] for f in feats], axis=0
                        )  # [7, 128]
                        h = jnp.maximum(
                            jnp.dot(
                                w1t, obs_r, preferred_element_type=jnp.float32
                            ) + b1,
                            0.0,
                        )
                        h = jnp.maximum(
                            jnp.dot(
                                w2t, h, preferred_element_type=jnp.float32
                            ) + b2,
                            0.0,
                        )
                        mu_rows.append(jnp.sum(h * wmu, axis=0, keepdims=True))
                        if emit:
                            v_rows.append(
                                jnp.sum(h * wv, axis=0, keepdims=True)
                            )
                    mu = jnp.concatenate(mu_rows, axis=0) + bmu_s  # [R, 128]
                    v = (
                        jnp.concatenate(v_rows, axis=0) + bv_s
                        if emit else None
                    )
                return mu, v
        cache_xs = tuple(fs[41 + i] for i in range(13))
        cache_e = fs[54]
        cache_lat = [fs[55 + i] for i in range(4)]
        cache_cgm0 = fs[59]
        cache_risk0 = fs[60]
        cache_start = is_[6]
        t_min = is_[0]
        start_min = is_[1]
        day = is_[2]
        seg = is_[3]
        lat_next = is_[4]
        n_samp = is_[5]

        for i_step in range(TC):
            # ---- controller acts on the previous step's CGM observation,
            # exactly like the closed loop (sim_engine.py:33-37) ----
            if nn:
                # featurize (rl/policy.py featurize_parts): [cgm/400,
                # (cgm-140)/100, tanh(ins/(3b)), tanh(cho/10),
                # tanh(trend/10), tanh(iob/(120b)), tanh(20b)]
                f1 = ctrl_prev * (1.0 / 400.0)
                f2 = (ctrl_prev - 140.0) * 0.01
                f3 = jnp.tanh(ins_prev * inv3b)
                f4 = jnp.tanh(prev_cho * 0.1)
                f5 = jnp.tanh((ctrl_prev - ctrl_pprev) * 0.1)
                f6 = jnp.tanh(iob * inv120b)
                feats = (f1, f2, f3, f4, f5, f6, f7)
                if emit:
                    # learner rows 0-6: the featurized observation itself
                    for j in range(7):
                        lrn_out[j, i_step] = feats[j]
                else:
                    # record the controller's observation inputs (the
                    # learner reconstructs featurize() from these to
                    # recompute logp/value outside the kernel)
                    octrl_out[i_step] = ctrl_prev
                    oins_out[i_step] = ins_prev
                    ocho_out[i_step] = prev_cho
                    oprev_out[i_step] = ctrl_pprev
                    oiob_out[i_step] = iob
                mu, v = nn_forward(feats)
                if emit:
                    # row 7 = value (nulled in the learner's forward by the
                    # zero-padded w1 column; its grad column is discarded)
                    lrn_out[7, i_step] = v
                if cfg.deterministic or not cfg.nn_sample_actions:
                    raw = mu  # policy-mean actions (deployment/eval mode)
                else:
                    if i_step % 2 == 0:
                        za_pair = _normal_pair(rng, shape)
                    raw = mu + sigma_s * za_pair[i_step % 2]
                if emit:
                    lrn_out[8, i_step] = raw
                    # row 9 = behavior log-prob (rl/policy.gaussian_logprob)
                    z_lp = (raw - mu) * inv_sigma
                    lrn_out[9, i_step] = (
                        -0.5 * z_lp * z_lp - log_std_s - 0.5 * _LOG_2PI
                    )
                else:
                    raw_out[i_step] = raw
                if cfg.nn_decoder == "residual_bb":
                    # BB therapy command (reference basal_bolus_ctrller.py:
                    # 34-80 — the same inputs as the kernel's 'bb' branch)
                    # modulated multiplicatively by the policy within
                    # [exp(-scale), exp(+scale)] (rl/policy.py PolicyParams
                    # decoder='residual_bb'); the pump quantizes the FINAL
                    # command, matching the eval-path controller + env pump
                    glucose = ctrl_prev
                    meal_ann = prev_cho
                    bolus_u = (meal_ann * st) / quest_CR + (
                        glucose > 150.0
                    ).astype(jnp.float32) * (
                        glucose - cfg.bb_target
                    ) / quest_CF
                    bolus_cmd = jnp.where(meal_ann > 0, bolus_u / st, 0.0)
                    bb_cmd = basal_rate_u + bolus_cmd
                    mod = jnp.exp(cfg.nn_action_scale * jnp.tanh(raw))
                    insulin = _quantize(
                        bb_cmd * mod, cfg.inc_basal, cfg.min_basal,
                        cfg.max_basal,
                    )
                else:
                    # squashed Gaussian -> basal (rl/policy.py
                    # sample_action), then pump quantization
                    # (actuator/pump.py:32-39)
                    basal_cmd = cfg.nn_action_scale / (1.0 + jnp.exp(-raw))
                    if cfg.nn_scale_by_basal:
                        basal_cmd = basal_cmd * basal_rate_u
                    insulin = _quantize(
                        basal_cmd, cfg.inc_basal, cfg.min_basal,
                        cfg.max_basal,
                    )
                # insulin-on-board update (rl/policy.py iob_step): decay,
                # then add this step's dose
                iob = iob * iob_decay + insulin * float(st)
            elif cfg.controller == "pid":
                obs = ctrl_prev
                control = (
                    cfg.pid_p * (obs - cfg.pid_target)
                    + cfg.pid_i * pid_integ
                    + cfg.pid_d * (obs - pid_prev) / st
                )
                pid_integ = pid_integ + (obs - cfg.pid_target) * st
                pid_prev = obs
                insulin = _quantize(
                    control, cfg.inc_basal, cfg.min_basal, cfg.max_basal
                )
            elif cfg.controller == "bb":
                # basal-bolus therapy on the previous step's CGM + announced
                # meal (controllers/functional.py bb_controller, reference
                # basal_bolus_ctrller.py:34-80): bolus only when meal > 0
                glucose = ctrl_prev
                meal_ann = prev_cho  # g/min averaged over the prev step
                bolus_u = (meal_ann * st) / quest_CR + (
                    glucose > 150.0
                ).astype(jnp.float32) * (glucose - cfg.bb_target) / quest_CF
                bolus_cmd = jnp.where(meal_ann > 0, bolus_u / st, 0.0)
                insulin = _quantize(
                    basal_rate_u, cfg.inc_basal, cfg.min_basal, cfg.max_basal
                ) + _quantize(
                    bolus_cmd, cfg.inc_bolus, cfg.min_bolus, cfg.max_bolus
                )
            else:
                insulin = _quantize(
                    jnp.full(shape, cfg.const_basal, jnp.float32),
                    cfg.inc_basal,
                    cfg.min_basal,
                    cfg.max_basal,
                )

            # ---- scenario: candidate next-day plan + per-minute lookup.
            # The redraw runs only at the regen_every cadence — a deferred
            # midnight regen is observationally exact because no meal slot
            # can fire before 5 am (see PallasRolloutConfig.regen_every) ----
            if not cfg.deterministic and i_step % cfg.regen_every == 0:
                if cfg.scenario_kind == "random":
                    mins_last = start_min + t_min + (st - 1)
                    day_end = mins_last // MINUTES_PER_DAY
                    regen = (day_end > day).astype(jnp.float32)
                    new_t, new_a = _draw_meal_plan(cfg, rng, shape)
                    for s in range(6):
                        meal_t[s] = (
                            regen * new_t[s] + (1.0 - regen) * meal_t[s]
                        )
                        meal_a[s] = (
                            regen * new_a[s] + (1.0 - regen) * meal_a[s]
                        )
                    day = jnp.maximum(day, day_end)
                # refresh the auto-reset draw cache at the same cadence
                if cfg.autoreset:
                    rc = _reset_values(cfg, rng, x0, shape, with_plan=False)
                    cache_xs = rc["xs"]
                    cache_e = rc["e"]
                    cache_lat = rc["lat"]
                    cache_start = rc["start_min"]
                    cache_cgm0 = jnp.clip(
                        cache_xs[12] / p.Vg + cache_lat[1],
                        cfg.cgm_min,
                        cfg.cgm_max,
                    )
                    cache_risk0 = _risk_of(cache_cgm0)

            # one Box-Muller pair serves TWO steps' AR(1) advances (a
            # fresh lattice point is needed at most once per step, and both
            # halves of the pair are consumed instead of one)
            if (
                not cfg.deterministic
                and not cfg.exogenous_noise
                and i_step % 2 == 0
            ):
                z_pair = _normal_pair(rng, shape)

            CHO_acc = jnp.zeros(shape, jnp.float32)
            BG_acc = jnp.zeros(shape, jnp.float32)
            CGM_acc = jnp.zeros(shape, jnp.float32)

            for m in range(st):
                # meal for this minute (first-match lookup, scenario.py:37-42)
                if cfg.deterministic or cfg.scenario_kind == "static":
                    meal = jnp.zeros(shape, jnp.float32)
                    # static schedule: absolute episode minute -> grams (the
                    # exogenous meal_seq / CustomScenario analog)
                    for tt, aa in zip(
                        cfg.det_meal_times, cfg.det_meal_amounts
                    ):
                        hit = (t_min == jnp.int32(tt)).astype(jnp.float32)
                        meal = meal + hit * jnp.float32(aa)
                else:
                    # t_min is incremented per minute below, so here it IS
                    # the current absolute episode minute (do not add m)
                    mod = (start_min + t_min) % MINUTES_PER_DAY
                    modf = mod.astype(jnp.float32)
                    meal = jnp.zeros(shape, jnp.float32)
                    taken = jnp.zeros(shape, jnp.float32)
                    for s in range(6):
                        hit = (meal_t[s] == modf).astype(jnp.float32) * (
                            1.0 - taken
                        )
                        meal = meal + hit * meal_a[s]
                        taken = jnp.maximum(taken, hit)

                # meal announcement / eating state machine (patient.py)
                planned = planned + meal
                to_eat = jnp.where(
                    planned > 0, jnp.minimum(EAT_RATE, planned), 0.0
                )
                planned = jnp.maximum(planned - to_eat, 0.0)
                starts = (to_eat > 0) & (last_CHO <= 0)
                qsto_now = xs[0] + xs[1]
                last_Qsto = jnp.where(starts, qsto_now, last_Qsto)
                foodtaken = jnp.where(starts, 0.0, foodtaken)
                eating_b = starts | (eating > 0)
                foodtaken = jnp.where(eating_b, foodtaken + to_eat, foodtaken)
                ends = (to_eat <= 0) & (last_CHO > 0)
                eating_b = eating_b & ~ends
                eating = eating_b.astype(jnp.float32)
                last_CHO = to_eat

                d_mg = to_eat * 1000.0
                ins_rate = insulin * 6000.0 / p.BW
                Dbar = last_Qsto + foodtaken * 1000.0
                xs = _rk4_minute(p, xs, d_mg, ins_rate, Dbar)
                t_min = t_min + 1

                bg_m = xs[12] / p.Vg
                if m == st - 1:
                    # fresh CGM sample (devices/cgm.py + ops/noise.py)
                    if cfg.exogenous_noise:
                        # noise plane row i_step = the env path's
                        # noise_seq[step + 2] (2 reset pops first)
                        cgm_m = jnp.clip(
                            bg_m + noise_ref[i_step],
                            cfg.cgm_min,
                            cfg.cgm_max,
                        )
                    elif cfg.deterministic:
                        cgm_m = jnp.clip(bg_m, cfg.cgm_min, cfg.cgm_max)
                    else:
                        tau = (n_samp + 1) * st
                        k = tau // MDL_SAMPLE_TIME
                        u = (tau - k * MDL_SAMPLE_TIME).astype(
                            jnp.float32
                        ) / MDL_SAMPLE_TIME
                        need = ((k + 2) >= lat_next).astype(jnp.float32)
                        z = z_pair[i_step % 2]
                        e_new = cfg.pacf * (e_ar + z)
                        eps_new = _johnson(cfg, e_new)
                        e_ar = need * e_new + (1.0 - need) * e_ar
                        new_lat = [
                            need * l_next + (1.0 - need) * l_cur
                            for l_cur, l_next in zip(
                                lat, [lat[1], lat[2], lat[3], eps_new]
                            )
                        ]
                        lat = new_lat
                        lat_next = lat_next + need.astype(jnp.int32)
                        seg = k
                        noise = _catmull(lat[0], lat[1], lat[2], lat[3], u)
                        cgm_m = jnp.clip(
                            bg_m + noise, cfg.cgm_min, cfg.cgm_max
                        )
                        n_samp = n_samp + 1
                    last_CGM = cgm_m
                else:
                    cgm_m = last_CGM

                # the reference records the ANNOUNCED scenario meal in the
                # CHO history (env.py:54,60 records action.meal, not the
                # EAT_RATE-limited eaten amount) — and the BB controller's
                # meal input is that announced value
                CHO_acc = CHO_acc + meal / float(st)
                BG_acc = BG_acc + bg_m / float(st)
                CGM_acc = CGM_acc + cgm_m / float(st)

            # ---- reward / done (env.py:100-103, risk_diff env.py:27-33);
            # risk(prev CGM) is carried from the step that produced it ----
            risk_now = _risk_of(CGM_acc)
            if cfg.reward_kind == "neg_risk":
                reward = -0.1 * risk_now
            else:
                reward = prev_risk - risk_now
            done = (BG_acc < cfg.bg_done_low) | (BG_acc > cfg.bg_done_high)
            donef = done.astype(jnp.float32)

            # ---- write trajectory row ----
            cgm_out[i_step] = CGM_acc
            bg_out[i_step] = BG_acc
            rew_out[i_step] = reward
            done_out[i_step] = donef
            cho_out[i_step] = CHO_acc
            ins_out[i_step] = insulin

            prev_risk = risk_now
            prev_cho = CHO_acc
            ctrl_pprev = ctrl_prev  # trend baseline: the obs just acted on
            ctrl_prev = CGM_acc
            ins_prev = insulin

            # ---- auto-reset (rollout.py autoreset_step semantics); reset
            # values come from the per-lane draw cache (refreshed every
            # regen_every steps above) ----
            if not cfg.deterministic and cfg.autoreset:
                cgm0 = cache_cgm0  # derived once at the cache refresh
                keep = 1.0 - donef

                def mix(old, new):
                    return keep * old + donef * new

                xs = tuple(mix(x, xn) for x, xn in zip(xs, cache_xs))
                planned = keep * planned
                last_CHO = keep * last_CHO
                eating = keep * eating
                last_Qsto = mix(last_Qsto, cache_xs[0] + cache_xs[1])
                foodtaken = keep * foodtaken
                last_CGM = mix(last_CGM, cgm0)
                e_ar = mix(e_ar, cache_e)
                lat = [mix(l, ln) for l, ln in zip(lat, cache_lat)]
                # meal plan kept (i.i.d. across episodes — see _reset_values)
                pid_integ = keep * pid_integ
                pid_prev = keep * pid_prev
                prev_risk = mix(prev_risk, cache_risk0)
                # the next controller invocation sees the NEW episode's reset
                # obs (autoreset_step carry semantics, envs/rollout.py)
                ctrl_prev = mix(ctrl_prev, cgm0)
                prev_cho = keep * prev_cho  # fresh episode: no announced meal
                ins_prev = keep * ins_prev  # reset carry has insulin = 0
                ctrl_pprev = mix(ctrl_pprev, cgm0)  # zero trend at reset
                iob = keep * iob  # fresh episode: no insulin on board
                keep_i = (1 - done).astype(jnp.int32)
                done_i = done.astype(jnp.int32)
                t_min = keep_i * t_min  # reset episode clock to 0
                start_min = keep_i * start_min + done_i * cache_start
                day = keep_i * day
                seg = keep_i * seg
                lat_next = keep_i * lat_next + done_i * 3
                n_samp = keep_i * n_samp

        if emit:
            # bootstrap VALUE: the GAE tail value of the obs the NEXT step
            # would act on, computed in-kernel (rst row 2)
            @pl.when(t == n_tchunks - 1)
            def _tail_value():
                tf = (
                    ctrl_prev * (1.0 / 400.0),
                    (ctrl_prev - 140.0) * 0.01,
                    jnp.tanh(ins_prev * inv3b),
                    jnp.tanh(prev_cho * 0.1),
                    jnp.tanh((ctrl_prev - ctrl_pprev) * 0.1),
                    jnp.tanh(iob * inv120b),
                    f7,
                )
                _, v_tail = nn_forward(tf)
                rst_out[2] = v_tail
        elif nn:
            # bootstrap row: the obs the NEXT step would act on, for the
            # learner's GAE tail value (rst rows 2..4)
            @pl.when(t == n_tchunks - 1)
            def _tail_obs():
                rst_out[2] = ctrl_prev
                rst_out[3] = ins_prev
                rst_out[4] = prev_cho
                rst_out[5] = ctrl_pprev
                rst_out[6] = iob

        # ---- store state back ----
        for i in range(13):
            fs[i] = xs[i]
        fs[13], fs[14], fs[15] = planned, last_CHO, eating
        fs[16], fs[17] = last_Qsto, foodtaken
        fs[18], fs[19] = last_CGM, e_ar
        for i in range(4):
            fs[20 + i] = lat[i]
        for i in range(6):
            fs[24 + i] = meal_t[i]
            fs[30 + i] = meal_a[i]
        fs[36], fs[37] = pid_integ, pid_prev
        fs[38] = prev_risk
        fs[39] = prev_cho
        fs[40] = ctrl_prev
        for i in range(13):
            fs[41 + i] = cache_xs[i]
        fs[54] = cache_e
        for i in range(4):
            fs[55 + i] = cache_lat[i]
        fs[59] = cache_cgm0
        fs[60] = cache_risk0
        fs[61] = ins_prev
        fs[62] = ctrl_pprev
        fs[63] = iob
        is_[0], is_[1], is_[2] = t_min, start_min, day
        is_[3], is_[4], is_[5] = seg, lat_next, n_samp
        is_[6] = cache_start

    return kernel


def make_pallas_rollout(cfg: PallasRolloutConfig, batch: int, interpret: bool = False):
    """Build the compiled rollout: (packed_params, seed) -> traj dict.

    ``packed_params`` from :func:`pack_params`; returns arrays [n_steps, B]
    for CGM/BG/reward/done/CHO/insulin.

    With ``cfg.exogenous_noise`` the runner takes two extra arrays:
    ``run(packed, seed, reset_noise, step_noise)`` where ``reset_noise`` is
    [2, rows, 128] (the env's two reset pops) and ``step_noise`` is
    [n_steps, rows, 128] (one per step) — the same values the env path would
    read from ``EnvParams.noise_seq[0:2]`` and ``[2:n_steps+2]``.
    """
    R = cfg.block_rows
    block = R * LANES
    if batch % block:
        raise ValueError(f"batch {batch} must be a multiple of {block}")
    if cfg.n_steps % cfg.t_chunk:
        raise ValueError("n_steps must be a multiple of t_chunk")
    if cfg.exogenous_noise and cfg.autoreset:
        raise ValueError(
            "exogenous_noise requires autoreset=False (in-step resets would "
            "need reset-noise indexing the planes don't carry)"
        )
    if cfg.prng not in ("hw", "sw"):
        raise ValueError(f"prng must be 'hw' or 'sw'; got {cfg.prng!r}")
    if (
        cfg.controller == "nn"
        and cfg.exogenous_noise
        and not cfg.deterministic
        and cfg.nn_sample_actions
    ):
        raise ValueError(
            "'nn' + exogenous_noise requires mean actions (deterministic="
            "True or nn_sample_actions=False): the planes pin the CGM noise "
            "stream, but stochastic action sampling has no exogenous source "
            "to pin against — the noise-for-noise parity config is "
            "policy-mean actions + exogenous CGM noise "
            "(tests/test_fused_ppo.py)"
        )
    if cfg.nn_hidden % 8:
        raise ValueError("nn_hidden must be a multiple of 8 (sublane tile)")
    if cfg.nn_decoder not in ("sigmoid", "residual_bb"):
        raise ValueError(
            f"nn_decoder must be 'sigmoid' or 'residual_bb'; "
            f"got {cfg.nn_decoder!r}"
        )
    if cfg.scenario_kind not in ("random", "static"):
        raise ValueError(
            f"scenario_kind must be 'random' or 'static'; "
            f"got {cfg.scenario_kind!r}"
        )
    if len(cfg.det_meal_times) != len(cfg.det_meal_amounts):
        raise ValueError(
            "det_meal_times and det_meal_amounts must have the same length"
        )
    if cfg.reward_kind not in ("risk_diff", "neg_risk"):
        raise ValueError(
            f"reward_kind must be 'risk_diff' or 'neg_risk'; "
            f"got {cfg.reward_kind!r}"
        )
    if cfg.regen_every < 1 or cfg.regen_every * cfg.sample_time > 288:
        raise ValueError(
            f"regen_every={cfg.regen_every} must satisfy 1 <= regen_every "
            f"and regen_every * sample_time <= 288 (the pre-5am window that "
            f"makes deferred midnight redraws observationally exact)"
        )
    n_blocks = batch // block
    n_tchunks = cfg.n_steps // cfg.t_chunk
    rows = batch // LANES

    kernel = _make_kernel(cfg, n_blocks)
    TC = cfg.t_chunk

    nn = cfg.controller == "nn"
    emit = nn and cfg.nn_emit_learner_rows
    if cfg.nn_emit_learner_rows and not nn:
        raise ValueError("nn_emit_learner_rows requires controller='nn'")
    n_rst = 3 if emit else (7 if nn else 2)
    out_field = jax.ShapeDtypeStruct((cfg.n_steps, rows, LANES), jnp.float32)
    traj_spec = pl.BlockSpec(
        (TC, R, LANES), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM
    )
    rst_field = jax.ShapeDtypeStruct((n_rst, rows, LANES), jnp.float32)
    rst_spec = pl.BlockSpec(
        (n_rst, R, LANES), lambda b, t: (0, b, 0), memory_space=pltpu.VMEM
    )
    state_f_field = jax.ShapeDtypeStruct((NS_F, rows, LANES), jnp.float32)
    state_i_field = jax.ShapeDtypeStruct((NS_I, rows, LANES), jnp.int32)
    state_f_spec = pl.BlockSpec(
        (NS_F, R, LANES), lambda b, t: (0, b, 0), memory_space=pltpu.VMEM
    )
    state_i_spec = pl.BlockSpec(
        (NS_I, R, LANES), lambda b, t: (0, b, 0), memory_space=pltpu.VMEM
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # (seed, init)
        pl.BlockSpec(
            (NP_PLANES, R, LANES),
            lambda b, t: (0, b, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if nn:
        H = cfg.nn_hidden
        in_specs.append(
            pl.BlockSpec(
                (H, H + 16), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            )
        )
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)  # (b_mu, log_std)
        )
    if cfg.exogenous_noise:
        in_specs += [
            pl.BlockSpec(  # reset noise: both pops, every grid step
                (2, R, LANES), lambda b, t: (0, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # step noise: this t_chunk's rows
                (TC, R, LANES), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM
            ),
        ]
    if cfg.persistent_state:
        in_specs += [state_f_spec, state_i_spec]

    if emit:
        # ONE [10, T, rows, 128] learner-row buffer instead of the six
        # observation planes: rows 0-6 features, 7 value, 8 raw, 9 logp
        # (see PallasRolloutConfig.nn_emit_learner_rows)
        lrn_field = jax.ShapeDtypeStruct(
            (10, cfg.n_steps, rows, LANES), jnp.float32
        )
        lrn_spec = pl.BlockSpec(
            (10, TC, R, LANES), lambda b, t: (0, t, b, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = [out_field] * 6 + [lrn_field] + [rst_field]
        out_specs = [traj_spec] * 6 + [lrn_spec] + [rst_spec]
    else:
        n_traj = 12 if nn else 6
        out_shape = [out_field] * n_traj + [rst_field]
        out_specs = [traj_spec] * n_traj + [rst_spec]
    scratch = []
    if cfg.persistent_state:
        out_shape += [state_f_field, state_i_field]
        out_specs += [state_f_spec, state_i_spec]
    else:
        scratch = [
            pltpu.VMEM((NS_F, R, LANES), jnp.float32),
            pltpu.VMEM((NS_I, R, LANES), jnp.int32),
        ]

    # The 'nn' configs sit within ~1 MB of the default 16 MB scoped-VMEM
    # budget (12-13 output planes + state + params + double buffering);
    # raise Mosaic's limit so the t_chunk=16 pipeline keeps its depth —
    # v5e VMEM is far larger than the 16 MB default scoped cap.
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        if nn else None
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tchunks),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )

    def run(
        packed_params: jnp.ndarray,
        seed,
        reset_noise=None,
        step_noise=None,
        weights=None,
        state=None,
        init=None,
    ) -> dict:
        """Run the kernel.  For 'nn' configs pass ``weights`` (from
        :func:`pack_policy_weights`).  For persistent configs pass
        ``state=(state_f, state_i)`` (zeros on the first call) and
        ``init`` (traced int32: 1 = draw fresh episodes and ignore the
        incoming state, 0 = continue it); the result dict then carries
        ``state_f``/``state_i`` to thread into the next call.  The reset
        rows (BG0/CGM0) are only meaningful on init=1 calls."""
        seed_s = jnp.asarray(seed, jnp.int32).reshape(-1)[0]
        init_s = (
            jnp.int32(1) if init is None else jnp.asarray(init, jnp.int32)
        )
        seed_arr = jnp.stack([seed_s, init_s])
        args = [seed_arr, packed_params]
        if nn:
            if weights is None:
                raise ValueError("'nn' config needs weights= "
                                 "(pack_policy_weights)")
            w = jnp.asarray(weights, jnp.float32)
            args.append(w)
            # (b_mu, log_std[, b_v]) -> SMEM scalars
            args.append(w[0:3, 9] if emit else w[0:2, 9])
        if cfg.exogenous_noise:
            if reset_noise is None or step_noise is None:
                raise ValueError(
                    "exogenous_noise config needs reset_noise [2, rows, 128] "
                    "and step_noise [n_steps, rows, 128]"
                )
            args += [
                jnp.asarray(reset_noise, jnp.float32),
                jnp.asarray(step_noise, jnp.float32),
            ]
        if cfg.persistent_state:
            if state is None:
                state = (
                    jnp.zeros((NS_F, rows, LANES), jnp.float32),
                    jnp.zeros((NS_I, rows, LANES), jnp.int32),
                )
            args += [state[0], state[1]]
        outs = call(*args)
        cgm, bg, rew, done, cho, ins = outs[:6]
        k = 6
        unb = lambda a: a.reshape(cfg.n_steps, batch)
        res = {
            "CGM": unb(cgm),
            "BG": unb(bg),
            "reward": unb(rew),
            "done": unb(done) > 0.5,
            "CHO": unb(cho),
            "insulin": unb(ins),
        }
        if emit:
            lrn = outs[k]
            k += 1
            # [10, T, rows, 128] -> the learner's feature-major [10, T*B]
            # buffer (column index = t*B + b, exactly pack_minibatch_rows'
            # row-major flattening) + a [T, B] view of the value row
            res["learner"] = lrn.reshape(10, cfg.n_steps * batch)
            res["value"] = lrn[7].reshape(cfg.n_steps, batch)
        elif nn:
            res["raw"] = unb(outs[k])
            res["octrl"] = unb(outs[k + 1])
            res["oins"] = unb(outs[k + 2])
            res["ocho"] = unb(outs[k + 3])
            res["oprev"] = unb(outs[k + 4])
            res["oiob"] = unb(outs[k + 5])
            k += 6
        rst = outs[k]
        k += 1
        res["BG0"] = rst[0].reshape(batch)
        res["CGM0"] = rst[1].reshape(batch)
        if emit:
            # in-kernel bootstrap value (GAE tail)
            res["tail_value"] = rst[2].reshape(batch)
        elif nn:
            # tail observation inputs (bootstrap value for GAE)
            res["tail_octrl"] = rst[2].reshape(batch)
            res["tail_oins"] = rst[3].reshape(batch)
            res["tail_ocho"] = rst[4].reshape(batch)
            res["tail_oprev"] = rst[5].reshape(batch)
            res["tail_oiob"] = rst[6].reshape(batch)
        if cfg.persistent_state:
            res["state_f"], res["state_i"] = outs[k], outs[k + 1]
        return res

    return run


def make_sharded_pallas_rollout(
    cfg: PallasRolloutConfig,
    batch: int,
    mesh,
    axis: str = "dp",
    interpret: bool = False,
):
    """Multi-chip fast path: the in-VMEM kernel under ``shard_map`` over a
    device mesh axis — each device runs its shard of the patient batch with
    zero inter-chip communication during the rollout (the workload is
    embarrassingly parallel over patients, like the reference's process
    pool, sim_engine.py:65-76).  Per-device RNG streams are decorrelated by
    folding the mesh position into the seed.

    Supports EVERY kernel configuration the single-device runner does, with
    the same ``run(packed_params, seed, reset_noise=, step_noise=, weights=,
    state=, init=)`` signature:

      * 'nn' controller — ``weights`` replicated to every device; the extra
        raw/octrl/oins/ocho trajectory planes and tail observations come
        back batch-sharded (the fused PPO actor, rl/fused.py).
      * ``persistent_state`` — ``state_f``/``state_i`` stay sharded over the
        batch axis across calls.
      * ``exogenous_noise`` — the caller-supplied noise planes are consumed
        batch-sharded, exactly like the packed params.

    ``batch`` is GLOBAL; it must split evenly into per-device batches that
    satisfy the single-device kernel's tiling constraints (the inner builder
    raises otherwise).  Returns global-batch arrays ([n_steps, batch]
    trajectories, [batch] reset samples).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    if batch % (n_dev * LANES):
        raise ValueError(
            f"global batch {batch} must divide into {n_dev} devices x "
            f"{LANES} lanes"
        )
    if cfg.nn_emit_learner_rows:
        raise ValueError(
            "nn_emit_learner_rows is the single-device fused-learner fast "
            "path (the [10, T*B] buffer's flat column index interleaves "
            "the batch axis); the mesh trainer uses the XLA learner with "
            "the observation-plane outputs (rl/fused.py kernel_prep=False)"
        )
    per = batch // n_dev
    inner = make_pallas_rollout(cfg, per, interpret=interpret)
    nn = cfg.controller == "nn"
    rows = batch // LANES

    # (in_spec, kwarg-builder) per optional input, in the order run() packs
    # them; sharded planes follow the packed-params layout [planes, rows, 128]
    shard3 = P(None, axis, None)
    rest_specs = []
    if cfg.exogenous_noise:
        rest_specs += [shard3, shard3]  # reset_noise, step_noise
    if nn:
        rest_specs += [P()]  # weights (replicated)
    if cfg.persistent_state:
        rest_specs += [shard3, shard3, P()]  # state_f, state_i, init

    def device_fn(packed, seed, *rest):
        dseed = seed + jax.lax.axis_index(axis) * jnp.int32(7919)
        kw = {}
        i = 0
        if cfg.exogenous_noise:
            kw["reset_noise"], kw["step_noise"] = rest[i], rest[i + 1]
            i += 2
        if nn:
            kw["weights"] = rest[i]
            i += 1
        if cfg.persistent_state:
            kw["state"] = (rest[i], rest[i + 1])
            kw["init"] = rest[i + 2]
            i += 3
        return inner(packed, dseed, **kw)

    out_specs = {
        k: P(None, axis)
        for k in ("CGM", "BG", "reward", "done", "CHO", "insulin")
    }
    out_specs["BG0"] = P(axis)
    out_specs["CGM0"] = P(axis)
    if nn:
        for k in ("raw", "octrl", "oins", "ocho", "oprev", "oiob"):
            out_specs[k] = P(None, axis)
        for k in ("tail_octrl", "tail_oins", "tail_ocho", "tail_oprev",
                  "tail_oiob"):
            out_specs[k] = P(axis)
    if cfg.persistent_state:
        out_specs["state_f"] = shard3
        out_specs["state_i"] = shard3

    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), *rest_specs),
        out_specs=out_specs,
        check_vma=False,
    )

    def run(
        packed_params: jnp.ndarray,
        seed,
        reset_noise=None,
        step_noise=None,
        weights=None,
        state=None,
        init=None,
    ) -> dict:
        rest = []
        if cfg.exogenous_noise:
            if reset_noise is None or step_noise is None:
                raise ValueError(
                    "exogenous_noise config needs reset_noise [2, rows, 128] "
                    "and step_noise [n_steps, rows, 128] (global rows; "
                    "sharded over the batch axis like packed_params)"
                )
            rest += [
                jnp.asarray(reset_noise, jnp.float32),
                # step noise arrives [n_steps, rows, 128]; shard_map splits
                # the rows axis, matching the per-device kernel's view
                jnp.asarray(step_noise, jnp.float32),
            ]
        if nn:
            if weights is None:
                raise ValueError(
                    "'nn' config needs weights= (pack_policy_weights)"
                )
            rest.append(jnp.asarray(weights, jnp.float32))
        if cfg.persistent_state:
            if state is None:
                state = (
                    jnp.zeros((NS_F, rows, LANES), jnp.float32),
                    jnp.zeros((NS_I, rows, LANES), jnp.int32),
                )
            init_s = (
                jnp.int32(1) if init is None else jnp.asarray(init, jnp.int32)
            )
            rest += [state[0], state[1], init_s]
        elif init is not None:
            raise ValueError("init= only applies to persistent_state configs")
        return sharded(
            packed_params, jnp.asarray(seed, jnp.int32).reshape(()), *rest
        )

    return run
