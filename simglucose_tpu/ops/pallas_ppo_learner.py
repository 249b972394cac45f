"""Fused PPO grad-step as one pallas TPU kernel.

The XLA learner spends ~0.27 ms per minibatch grad step at bench scale
(131072 rows x a 7->64->64->2 MLP): each step is ~10 separate MXU/VPU
kernels that all stream the minibatch through HBM again (profile:
tools/profile_fused_ppo.py; the step cost is superlinear in rows and
insensitive to bf16 inputs — it is pass-count-bound, not FLOPs-bound).

This kernel runs the ENTIRE grad step — policy/value forward, the clipped-
surrogate PPO loss, and the hand-derived backward — in ONE pass over the
minibatch: a grid over row tiles, each tile resident in VMEM, weight
gradients accumulated in the VMEM-resident outputs across grid steps.
Matmul inputs are cast to ``compute_dtype`` (bf16 by default) with f32 MXU
accumulation; everything else stays f32.

Layout is FEATURE-MAJOR ([feature, rows]): rows ride the 128-lane axis, so
the per-row loss math is lane-parallel elementwise work and every weight
gradient is one ``dot_general`` contracting the row axis.  The buffer has
12 rows (see ``pack_minibatch_rows``): obs occupies rows 0-6 (+ a zero
spare at 7 so the obs slice is the aligned ``[0:8]``), and raw / logp_old /
adv / ret sit at rows 8-11 (the aligned ``[8:12]`` slice).

Loss parity: implements exactly ``rl/ppo._ppo_loss`` (clipped surrogate +
vf_coef * 0.5*MSE value loss; the entropy term depends only on ``log_std``
and is added by the caller).  The advantage mean/std are computed by the
caller over the minibatch (the same values XLA's ``adv.mean()/adv.std()``
produce) and enter as SMEM scalars.  Gradient parity vs ``jax.grad`` of
the XLA loss is pinned by tests/test_pallas_ppo_learner.py.

Reference analog: the rllab DDPG trainer this stack replaces
(reference: examples/run_rllab.py:1-43) has no TPU learner; this is the
TPU-native learner half of BASELINE config 4.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OBS_DIM = 7
FM_ROWS = 12  # 0-6 obs, 7 zero spare, 8 raw, 9 logp_old, 10 adv, 11 ret

_LOG_2PI = math.log(2.0 * math.pi)


class PPOGradOut(NamedTuple):
    """Gradients in PolicyParams leaf shapes + loss sums (the caller turns
    sums into means and adds the entropy gradient)."""

    dw1: jnp.ndarray  # [OBS_DIM, H]
    db1: jnp.ndarray  # [H]
    dw2: jnp.ndarray  # [H, H]
    db2: jnp.ndarray  # [H]
    dw_head: jnp.ndarray  # [H, 2]  (columns: mu, v)
    db_head: jnp.ndarray  # [2]
    dlog_std: jnp.ndarray  # [] pg part only
    pg_sum: jnp.ndarray  # [] sum of -min(pg1, pg2)
    v_sum: jnp.ndarray  # [] sum of 0.5*(v-ret)^2


def pack_minibatch_rows(obs, raw, logp, adv, ret):
    """[N, OBS_DIM] obs + four [N] columns -> the [FM_ROWS, N] feature-major
    buffer the kernel consumes."""
    N = obs.shape[0]
    z = jnp.zeros((1, N), obs.dtype)
    return jnp.concatenate(
        [
            obs.T,  # rows 0-6
            z,  # row 7 spare (keeps the obs slice 8-sublane aligned)
            raw.reshape(1, N),
            logp.reshape(1, N),
            adv.reshape(1, N),
            ret.reshape(1, N),
        ],
        axis=0,
    )


def _kernel(
    scal_ref,  # SMEM [1, 4]: log_std, adv_mean, adv_rstd, inv_n
    data_ref,  # VMEM [FM_ROWS, Rt]
    w1t_ref,  # [H, 8]   (W1^T, zero-padded obs column 7)
    b1_ref,  # [H, 1]
    w2t_ref,  # [H, H]   (W2^T)
    b2_ref,  # [H, 1]
    wht_ref,  # [2, H]   (W_head^T)
    bh_ref,  # [2, 1]
    dw1_ref,  # out [8, H]
    db1_ref,  # out [H, 1]
    dw2_ref,  # out [H, H]
    db2_ref,  # out [H, 1]
    dwh_ref,  # out [H, 2]
    dbh_ref,  # out [2, 1]
    sums_ref,  # out [1, 8]: dlog_std, pg_sum, v_sum
    *,
    act: str,
    clip_eps: float,
    vf_coef: float,
    compute_dtype,
):
    t = pl.program_id(0)
    f32 = jnp.float32
    cd = compute_dtype

    log_std = scal_ref[0, 0]
    adv_mean = scal_ref[0, 1]
    adv_rstd = scal_ref[0, 2]
    inv_n = scal_ref[0, 3]

    x = data_ref[0:8, :]  # [8, Rt] (row 7 is zeros)
    tail = data_ref[8:12, :]  # [4, Rt]
    raw = tail[0:1, :]
    logp_old = tail[1:2, :]
    adv = tail[2:3, :]
    ret = tail[3:4, :]

    def mm(a, b):  # a [A, K] @ b [K, R] -> [A, R]
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def mmT(a, b):  # a [K, A] , b [K, R] -> a^T @ b = [A, R]
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def mm_rows(a, b):  # a [A, R] , b [B, R] -> [A, B] (contract rows/lanes)
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )

    if act == "relu":
        f = lambda p: jnp.maximum(p, 0.0)
        fprime = lambda h: (h > 0.0).astype(f32)
    elif act == "tanh":
        f = jnp.tanh
        fprime = lambda h: 1.0 - h * h
    else:  # pragma: no cover - guarded by the wrapper
        raise ValueError(act)

    # ---- forward: h = f(W^T x + b), feature-major ----
    h1 = f(mm(w1t_ref[:, :], x) + b1_ref[:, :])  # [H, Rt]
    h2 = f(mm(w2t_ref[:, :], h1) + b2_ref[:, :])  # [H, Rt]
    hv = mm(wht_ref[:, :], h2) + bh_ref[:, :]  # [2, Rt]
    mu = hv[0:1, :]
    v = hv[1:2, :]

    # ---- PPO loss pieces (per lane) — exactly rl/ppo._ppo_loss ----
    es = jnp.exp(-log_std)
    z = (raw - mu) * es
    logp = -0.5 * z * z - log_std - 0.5 * _LOG_2PI
    ratio = jnp.exp(logp - logp_old)
    adv_n = (adv - adv_mean) * adv_rstd
    pg1 = ratio * adv_n
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    pg2 = clipped * adv_n
    # d min(pg1, pg2)/d ratio: unclipped path -> adv_n; clipped path ->
    # adv_n only while the clip is inactive.  Ties happen exactly when the
    # clip is inactive, where both paths agree (matches lax.min's balanced
    # tie-splitting).
    in_bounds = (
        (ratio >= 1.0 - clip_eps) & (ratio <= 1.0 + clip_eps)
    ).astype(f32)
    g_min = jnp.where(pg1 <= pg2, 1.0, in_bounds)
    dratio = (-inv_n) * adv_n * g_min
    dlogp = dratio * ratio
    dmu = dlogp * z * es  # [1, Rt]
    dv = (vf_coef * inv_n) * (v - ret)

    # ---- backward ----
    dhv = jnp.concatenate([dmu, dv], axis=0)  # [2, Rt]
    dwh_t = mm_rows(h2, dhv)  # [H, 2]
    dbh_t = jnp.sum(dhv, axis=1, keepdims=True)  # [2, 1]
    dh2 = mmT(wht_ref[:, :], dhv)  # [H, Rt]
    dg2 = dh2 * fprime(h2)
    dw2_t = mm_rows(h1, dg2)  # [H, H]
    db2_t = jnp.sum(dg2, axis=1, keepdims=True)  # [H, 1]
    dh1 = mmT(w2t_ref[:, :], dg2)  # [H, Rt]
    dg1 = dh1 * fprime(h1)
    dw1_t = mm_rows(x, dg1)  # [8, H]
    db1_t = jnp.sum(dg1, axis=1, keepdims=True)  # [H, 1]

    ds_t = jnp.sum(dlogp * (z * z - 1.0))
    pg_t = jnp.sum(-jnp.minimum(pg1, pg2))
    v_t = jnp.sum(0.5 * jnp.square(v - ret))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    sums_t = (
        jnp.where(lane == 0, ds_t, 0.0)
        + jnp.where(lane == 1, pg_t, 0.0)
        + jnp.where(lane == 2, v_t, 0.0)
    )

    @pl.when(t == 0)
    def _():
        dw1_ref[:, :] = dw1_t
        db1_ref[:, :] = db1_t
        dw2_ref[:, :] = dw2_t
        db2_ref[:, :] = db2_t
        dwh_ref[:, :] = dwh_t
        dbh_ref[:, :] = dbh_t
        sums_ref[:, :] = sums_t

    @pl.when(t > 0)
    def _():
        dw1_ref[:, :] += dw1_t
        db1_ref[:, :] += db1_t
        dw2_ref[:, :] += dw2_t
        db2_ref[:, :] += db2_t
        dwh_ref[:, :] += dwh_t
        dbh_ref[:, :] += dbh_t
        sums_ref[:, :] += sums_t


def ppo_grad_step(
    data_fm: jnp.ndarray,  # [FM_ROWS, mb] feature-major minibatch (f32)
    w1, b1, w2, b2, w_head, b_head, log_std,
    adv_mean, adv_std,
    *,
    act: str = "relu",
    clip_eps: float = 0.2,
    vf_coef: float = 0.5,
    row_tile: int = 2048,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    loss_rows: int | None = None,
) -> PPOGradOut:
    """One fused PPO grad step over a minibatch (see module docstring).

    ``adv_mean``/``adv_std`` are the minibatch advantage statistics
    (``jnp.mean``/``jnp.std``); ``loss_rows`` overrides the 1/N of the loss
    means (defaults to mb).  The entropy gradient (``-ent_coef`` on
    log_std) is the caller's to add."""
    if act not in ("relu", "tanh"):
        raise ValueError(f"act must be relu|tanh; got {act!r}")
    nrows, mb = data_fm.shape
    if nrows != FM_ROWS:
        raise ValueError(f"data_fm must have {FM_ROWS} rows; got {nrows}")
    H = w1.shape[1]
    rt = min(int(row_tile), mb)
    if mb % rt:
        raise ValueError(f"mb={mb} not divisible by row_tile={rt}")
    n = float(loss_rows if loss_rows is not None else mb)
    f32 = jnp.float32

    scal = jnp.stack(
        [
            jnp.asarray(log_std, f32).reshape(()),
            jnp.asarray(adv_mean, f32).reshape(()),
            1.0 / (jnp.asarray(adv_std, f32).reshape(()) + 1e-8),
            jnp.asarray(1.0 / n, f32),
        ]
    ).reshape(1, 4)

    # pre-transposed weights; W1^T gets a zero column for the spare obs row
    w1t = jnp.pad(w1.astype(f32), ((0, 1), (0, 0))).T  # [H, 8]
    w2t = w2.astype(f32).T
    wht = w_head.astype(f32).T  # [2, H]

    kernel = functools.partial(
        _kernel,
        act=act,
        clip_eps=float(clip_eps),
        vf_coef=float(vf_coef),
        compute_dtype=compute_dtype,
    )
    const = lambda t: (0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(mb // rt,),
        in_specs=[
            pl.BlockSpec((1, 4), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((FM_ROWS, rt), lambda t: (0, t)),
            pl.BlockSpec((H, 8), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((H, H), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((2, H), const),
            pl.BlockSpec((2, 1), const),
        ],
        out_specs=[
            pl.BlockSpec((8, H), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((H, H), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((H, 2), const),
            pl.BlockSpec((2, 1), const),
            pl.BlockSpec((1, 8), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, H), f32),
            jax.ShapeDtypeStruct((H, 1), f32),
            jax.ShapeDtypeStruct((H, H), f32),
            jax.ShapeDtypeStruct((H, 1), f32),
            jax.ShapeDtypeStruct((H, 2), f32),
            jax.ShapeDtypeStruct((2, 1), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
        ],
        interpret=interpret,
    )(
        scal,
        data_fm,
        w1t,
        b1.astype(f32).reshape(H, 1),
        w2t,
        b2.astype(f32).reshape(H, 1),
        wht,
        b_head.astype(f32).reshape(2, 1),
    )
    dw1, db1, dw2, db2, dwh, dbh, sums = outs
    return PPOGradOut(
        dw1=dw1[:OBS_DIM],
        db1=db1[:, 0],
        dw2=dw2,
        db2=db2[:, 0],
        dw_head=dwh,
        db_head=dbh[:, 0],
        dlog_std=sums[0, 0],
        pg_sum=sums[0, 1],
        v_sum=sums[0, 2],
    )


def ppo_grad_step_gather(
    packed_fm: jnp.ndarray,  # [FM_ROWS, N] feature-major FULL buffer (f32)
    perm_mb: jnp.ndarray,  # [bpm] i32: this minibatch's shuffle-block ids
    block_rows: int,  # rows per shuffle block (the lane tile)
    w1, b1, w2, b2, w_head, b_head, log_std,
    adv_mean, adv_std,
    *,
    act: str = "relu",
    clip_eps: float = 0.2,
    vf_coef: float = 0.5,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    loss_rows: int | None = None,
) -> PPOGradOut:
    """:func:`ppo_grad_step` with the epoch shuffle folded into the kernel:
    instead of materializing a shuffled copy of the packed buffer and
    ``dynamic_slice``-ing each minibatch out of it (two full-buffer HBM
    passes per epoch), the kernel's grid walks ``perm_mb`` — the minibatch's
    shuffle-block indices, scalar-prefetched so the BlockSpec index_map can
    gather block ``perm_mb[t]`` of the UNSHUFFLED buffer directly.  Same
    rows in the same order as slicing the shuffled copy (rl/ppo._update's
    block-granular shuffle), zero extra copies."""
    if act not in ("relu", "tanh"):
        raise ValueError(f"act must be relu|tanh; got {act!r}")
    nrows, N = packed_fm.shape
    if nrows != FM_ROWS:
        raise ValueError(f"packed_fm must have {FM_ROWS} rows; got {nrows}")
    bs = int(block_rows)
    if N % bs:
        raise ValueError(f"N={N} not divisible by block_rows={bs}")
    bpm = perm_mb.shape[0]
    mb = bpm * bs
    n = float(loss_rows if loss_rows is not None else mb)
    H = w1.shape[1]
    f32 = jnp.float32

    scal = jnp.stack(
        [
            jnp.asarray(log_std, f32).reshape(()),
            jnp.asarray(adv_mean, f32).reshape(()),
            1.0 / (jnp.asarray(adv_std, f32).reshape(()) + 1e-8),
            jnp.asarray(1.0 / n, f32),
        ]
    ).reshape(1, 4)
    w1t = jnp.pad(w1.astype(f32), ((0, 1), (0, 0))).T
    w2t = w2.astype(f32).T
    wht = w_head.astype(f32).T

    kernel = functools.partial(
        _kernel,
        act=act,
        clip_eps=float(clip_eps),
        vf_coef=float(vf_coef),
        compute_dtype=compute_dtype,
    )
    const = lambda t, perm: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bpm,),
        in_specs=[
            pl.BlockSpec((1, 4), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((FM_ROWS, bs), lambda t, perm: (0, perm[t])),
            pl.BlockSpec((H, 8), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((H, H), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((2, H), const),
            pl.BlockSpec((2, 1), const),
        ],
        out_specs=[
            pl.BlockSpec((8, H), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((H, H), const),
            pl.BlockSpec((H, 1), const),
            pl.BlockSpec((H, 2), const),
            pl.BlockSpec((2, 1), const),
            pl.BlockSpec((1, 8), const),
        ],
    )

    def kernel_with_prefetch(perm_ref, *refs, **kw):
        # the scalar-prefetch ref is consumed by the index_map only
        return kernel(*refs, **kw)

    outs = pl.pallas_call(
        kernel_with_prefetch,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, H), f32),
            jax.ShapeDtypeStruct((H, 1), f32),
            jax.ShapeDtypeStruct((H, H), f32),
            jax.ShapeDtypeStruct((H, 1), f32),
            jax.ShapeDtypeStruct((H, 2), f32),
            jax.ShapeDtypeStruct((2, 1), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
        ],
        interpret=interpret,
    )(
        perm_mb.astype(jnp.int32),
        scal,
        packed_fm,
        w1t,
        b1.astype(f32).reshape(H, 1),
        w2t,
        b2.astype(f32).reshape(H, 1),
        wht,
        b_head.astype(f32).reshape(2, 1),
    )
    dw1, db1, dw2, db2, dwh, dbh, sums = outs
    return PPOGradOut(
        dw1=dw1[:OBS_DIM],
        db1=db1[:, 0],
        dw2=dw2,
        db2=db2[:, 0],
        dw_head=dwh,
        db_head=dbh[:, 0],
        dlog_std=sums[0, 0],
        pg_sum=sums[0, 1],
        v_sum=sums[0, 2],
    )
