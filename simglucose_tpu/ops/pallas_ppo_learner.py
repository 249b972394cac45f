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


def _tile_grads(
    x, raw, logp_old, adv, ret, w1t, b1, w2t, b2, wht, bh,
    log_std, adv_mean, adv_rstd, inv_n,
    *, act, clip_eps, vf_coef, cd,
):
    """Forward + PPO loss + hand-derived backward for ONE row tile, on
    weight VALUES (shared by the grad-step and whole-epoch kernels).
    ``x`` is [8, Rt] (row 7 nulled by w1t's zero pad column — it may carry
    the rollout kernel's value row in the emit-mode buffer); raw /
    logp_old / adv / ret are [1, Rt].  Returns (dw1_t [8,H], db1_t [H,1],
    dw2_t [H,H], db2_t [H,1], dwh_t [H,2], dbh_t [2,1], ds_t, pg_t, v_t).
    dw1_t's row 7 is the pad column's gradient — callers discard or mask
    it."""
    f32 = jnp.float32

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
    else:  # pragma: no cover - guarded by the wrappers
        raise ValueError(act)

    # ---- forward: h = f(W^T x + b), feature-major ----
    h1 = f(mm(w1t, x) + b1)  # [H, Rt]
    h2 = f(mm(w2t, h1) + b2)  # [H, Rt]
    hv = mm(wht, h2) + bh  # [2, Rt]
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
    dh2 = mmT(wht, dhv)  # [H, Rt]
    dg2 = dh2 * fprime(h2)
    dw2_t = mm_rows(h1, dg2)  # [H, H]
    db2_t = jnp.sum(dg2, axis=1, keepdims=True)  # [H, 1]
    dh1 = mmT(w2t, dg2)  # [H, Rt]
    dg1 = dh1 * fprime(h1)
    dw1_t = mm_rows(x, dg1)  # [8, H]
    db1_t = jnp.sum(dg1, axis=1, keepdims=True)  # [H, 1]

    ds_t = jnp.sum(dlogp * (z * z - 1.0))
    pg_t = jnp.sum(-jnp.minimum(pg1, pg2))
    v_t = jnp.sum(0.5 * jnp.square(v - ret))
    return dw1_t, db1_t, dw2_t, db2_t, dwh_t, dbh_t, ds_t, pg_t, v_t


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

    data = data_ref[:, :]
    (dw1_t, db1_t, dw2_t, db2_t, dwh_t, dbh_t, ds_t, pg_t, v_t) = _tile_grads(
        data[0:8, :], data[8:9, :], data[9:10, :], data[10:11, :],
        data[11:12, :],
        w1t_ref[:, :], b1_ref[:, :], w2t_ref[:, :], b2_ref[:, :],
        wht_ref[:, :], bh_ref[:, :],
        scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2], scal_ref[0, 3],
        act=act, clip_eps=clip_eps, vf_coef=vf_coef, cd=compute_dtype,
    )
    _accumulate(
        t, dw1_t, db1_t, dw2_t, db2_t, dwh_t, dbh_t, ds_t, pg_t, v_t,
        dw1_ref, db1_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref, sums_ref,
    )


def _accumulate(
    t, dw1_t, db1_t, dw2_t, db2_t, dwh_t, dbh_t, ds_t, pg_t, v_t,
    dw1_ref, db1_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref, sums_ref,
):
    """Accumulate a tile's gradients into the VMEM-resident outputs across
    grid steps (shared by the single- and two-buffer grad-step kernels)."""
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


def _kernel2(
    scal_ref,  # SMEM [1, 4]: log_std, adv_mean, adv_rstd, inv_n
    main_ref,  # VMEM [10, Rt]: rows 0-6 obs, 7 value (ignored), 8 raw,
    #            9 logp_old — the rollout kernel's emit-mode buffer
    advret_ref,  # VMEM [2, Rt]: adv, ret (the GAE outputs)
    w1t_ref, b1_ref, w2t_ref, b2_ref, wht_ref, bh_ref,
    dw1_ref, db1_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref, sums_ref,
    *,
    act: str,
    clip_eps: float,
    vf_coef: float,
    compute_dtype,
):
    """The grad-step kernel over the TWO-buffer layout: the rollout
    kernel's [10, N] learner buffer plus the [2, N] adv/ret companion,
    both gathered by the same shuffle-block index map — no repack of the
    rollout output is ever materialized."""
    t = pl.program_id(0)
    main = main_ref[:, :]
    ar = advret_ref[:, :]
    (dw1_t, db1_t, dw2_t, db2_t, dwh_t, dbh_t, ds_t, pg_t, v_t) = _tile_grads(
        main[0:8, :], main[8:9, :], main[9:10, :], ar[0:1, :], ar[1:2, :],
        w1t_ref[:, :], b1_ref[:, :], w2t_ref[:, :], b2_ref[:, :],
        wht_ref[:, :], bh_ref[:, :],
        scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2], scal_ref[0, 3],
        act=act, clip_eps=clip_eps, vf_coef=vf_coef, cd=compute_dtype,
    )
    _accumulate(
        t, dw1_t, db1_t, dw2_t, db2_t, dwh_t, dbh_t, ds_t, pg_t, v_t,
        dw1_ref, db1_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref, sums_ref,
    )


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


def ppo_grad_step_gather2(
    main_fm: jnp.ndarray,  # [10, N] the rollout kernel's learner buffer
    advret_fm: jnp.ndarray,  # [2, N] (adv, ret) from GAE
    perm_mb: jnp.ndarray,  # [bpm] i32: this minibatch's shuffle-block ids
    block_rows: int,
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
    """:func:`ppo_grad_step_gather` over the TWO-buffer layout the rollout
    kernel emits directly (``nn_emit_learner_rows``): the [10, N] buffer
    (obs rows 0-6, value 7, raw 8, logp 9) stays exactly as the rollout
    kernel wrote it, and the GAE stage's [2, N] adv/ret companion rides a
    second gathered input with the SAME scalar-prefetched block index map.
    Nothing is repacked between the rollout and the grad step — the whole
    XLA prep stage (featurize + forwards + pack) of the round-3 design is
    gone (VERDICT r4 item 1)."""
    if act not in ("relu", "tanh"):
        raise ValueError(f"act must be relu|tanh; got {act!r}")
    nrows, N = main_fm.shape
    if nrows != 10:
        raise ValueError(f"main_fm must have 10 rows; got {nrows}")
    if advret_fm.shape != (2, N):
        raise ValueError(
            f"advret_fm must be [2, {N}]; got {advret_fm.shape}"
        )
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
        _kernel2,
        act=act,
        clip_eps=float(clip_eps),
        vf_coef=float(vf_coef),
        compute_dtype=compute_dtype,
    )
    const = lambda t, perm: (0, 0)
    gather = lambda t, perm: (0, perm[t])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bpm,),
        in_specs=[
            pl.BlockSpec((1, 4), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((10, bs), gather),
            pl.BlockSpec((2, bs), gather),
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
        # the scalar-prefetch ref is consumed by the index maps only
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
        main_fm,
        advret_fm,
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


def _gae_kernel(
    scal_ref,  # SMEM [1, 2]: gamma, gamma*lam
    r_ref,  # VMEM [T, Rt, 128] reward (penalty/custom shaping pre-applied)
    d_ref,  # VMEM [T, Rt, 128] done as f32 (zeros for the continuing task)
    v_ref,  # VMEM [T, Rt, 128] value
    tail_ref,  # VMEM [Rt, 128] bootstrap value
    out_ref,  # VMEM [2, T, Rt, 128]: row 0 = advantages, row 1 = returns
    *,
    T: int,
):
    gamma = scal_ref[0, 0]
    gl = scal_ref[0, 1]
    adv_next = jnp.zeros_like(tail_ref[:, :])
    v_next = tail_ref[:, :]
    for t in range(T - 1, -1, -1):
        nt = 1.0 - d_ref[t]
        v_t = v_ref[t]
        delta = r_ref[t] + gamma * v_next * nt - v_t
        adv = delta + gl * nt * adv_next
        out_ref[0, t] = adv
        out_ref[1, t] = adv + v_t
        adv_next = adv
        v_next = v_t


def gae_pack(
    reward: jnp.ndarray,  # [T, B] f32
    done: jnp.ndarray,  # [T, B] f32 (0/1; pass zeros for continuing GAE)
    value: jnp.ndarray,  # [T, B] f32
    tail_value: jnp.ndarray,  # [B] f32
    *,
    gamma: float,
    lam: float,
    row_tile: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """GAE + the learner's [2, N] adv/ret pack as ONE pallas kernel: the
    backward recurrence runs in-register over the statically-unrolled time
    axis per batch tile, writing advantages and returns directly in the
    feature-major layout ``ppo_grad_step_gather2`` consumes.  Exact-math
    equivalent of ``rl/ppo._gae`` + ``jnp.stack`` (sequential-form
    recurrence; the XLA path's associative scan reassociates, so parity is
    to f32 rounding).  Column index = t*B + b, matching the rollout
    kernel's learner buffer."""
    T, B = reward.shape
    if B % 128:
        raise ValueError(f"batch {B} must be a multiple of 128")
    rows = B // 128
    rt = max(r for r in range(1, min(int(row_tile), rows) + 1) if rows % r == 0)
    f32 = jnp.float32
    scal = jnp.stack(
        [jnp.asarray(gamma, f32), jnp.asarray(gamma * lam, f32)]
    ).reshape(1, 2)
    shape3 = lambda a: a.astype(f32).reshape(T, rows, 128)
    out = pl.pallas_call(
        functools.partial(_gae_kernel, T=T),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, rt, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((T, rt, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((T, rt, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((rt, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((2, T, rt, 128), lambda i: (0, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((2, T, rows, 128), f32),
        interpret=interpret,
    )(
        scal,
        shape3(reward),
        shape3(done),
        shape3(value),
        tail_value.astype(f32).reshape(rows, 128),
    )
    return out.reshape(2, T * B)


# ---------------------------------------------------------------------------
# Whole-epoch learner: ALL grad steps + clip + adam in ONE kernel
# ---------------------------------------------------------------------------


def _epoch_kernel(
    perm_ref,  # scalar-prefetch [S] i32: shuffle-block id per grid step
    stats_ref,  # SMEM [n_mb, 4]: adv_mean, adv_rstd, adam bias corrections
    #            c1 = 1-beta1^(t0+k+1), c2 = 1-beta2^(t0+k+1) per minibatch
    #            (precomputed in XLA — Mosaic has no scalar powf)
    hyper_ref,  # SMEM [1, 8]: inv_n, lr, beta1, beta2, eps, max_norm,
    #                          ent_coef, unused
    ls_ref,  # SMEM [1, 3]: log_std, m_ls, v_ls (incoming)
    data_ref,  # VMEM [FM_ROWS, bs] gathered tile
    *refs,
    bpm: int,
    act: str,
    clip_eps: float,
    vf_coef: float,
    compute_dtype,
):
    """Runs epochs x minibatches of PPO updates without leaving the kernel:
    grid step t = (minibatch e_i = t // bpm, tile j = t % bpm).  Weights,
    adam moments, and grad accumulators live in VMEM scratch for the whole
    grid; the optimizer (clip_by_global_norm + adam + scale(-lr), exactly
    optax's math) applies at each minibatch boundary."""
    # refs: 12 inputs (W, M, V x 6), then outputs (W, M, V x 6 + ls_out +
    # aux_out), then scratch (W, M, V, G x 6 + sc_ref SMEM)
    win = refs[0:6]
    min_ = refs[6:12]
    vin = refs[12:18]
    wout = refs[18:24]
    mout = refs[24:30]
    vout = refs[30:36]
    ls_out = refs[36]  # [1, 4]
    aux_out = refs[37]  # [n_mb, 8]
    ws = refs[38:44]  # scratch weights
    ms = refs[44:50]
    vs = refs[50:56]
    gs = refs[56:62]
    sc = refs[62]  # SMEM scratch [8]: log_std, m_ls, v_ls, g_ls, pg, v

    t = pl.program_id(0)
    S = pl.num_programs(0)
    f32 = jnp.float32
    e_i = t // bpm
    j = t % bpm

    inv_n = hyper_ref[0, 0]
    lr = hyper_ref[0, 1]
    beta1 = hyper_ref[0, 2]
    beta2 = hyper_ref[0, 3]
    eps = hyper_ref[0, 4]
    max_norm = hyper_ref[0, 5]
    ent_coef = hyper_ref[0, 6]

    @pl.when(t == 0)
    def _load():
        for k in range(6):
            ws[k][:, :] = win[k][:, :]
            ms[k][:, :] = min_[k][:, :]
            vs[k][:, :] = vin[k][:, :]
        sc[0] = ls_ref[0, 0]
        sc[1] = ls_ref[0, 1]
        sc[2] = ls_ref[0, 2]

    log_std = sc[0]
    data = data_ref[:, :]
    grads = _tile_grads(
        data[0:8, :], data[8:9, :], data[9:10, :], data[10:11, :],
        data[11:12, :],
        ws[0][:, :], ws[1][:, :], ws[2][:, :], ws[3][:, :],
        ws[4][:, :], ws[5][:, :],
        log_std, stats_ref[e_i, 0], stats_ref[e_i, 1], inv_n,
        act=act, clip_eps=clip_eps, vf_coef=vf_coef, cd=compute_dtype,
    )
    tile_g = grads[:6]
    ds_t, pg_t, v_t = grads[6], grads[7], grads[8]
    # grad layouts must match the weight scratch layouts:
    # ws = (w1t [H,8], b1 [H,1], w2t [H,H], b2 [H,1], wht [2,H], bh [2,1])
    # tile grads come in original orientation -> transpose w-grads.
    # dw1t's pad column (obs row 7) is structurally zero in the REAL
    # parameterization: it is exactly zero here because the 12-row buffer
    # keeps row 7 zeroed (pack_minibatch_rows), so no masking is needed —
    # the global-norm clip and the in-kernel adam see the same numbers
    # optax would.
    gw = (
        tile_g[0].T,  # dw1t [H, 8]
        tile_g[1],  # db1 [H, 1]
        tile_g[2].T,  # dw2t [H, H]
        tile_g[3],  # db2 [H, 1]
        tile_g[4].T,  # dwht [2, H]
        tile_g[5],  # dbh [2, 1]
    )

    @pl.when(j == 0)
    def _g_init():
        for k in range(6):
            gs[k][:, :] = gw[k]
        sc[3] = ds_t
        sc[4] = pg_t
        sc[5] = v_t

    @pl.when(j > 0)
    def _g_acc():
        for k in range(6):
            gs[k][:, :] += gw[k]
        sc[3] = sc[3] + ds_t
        sc[4] = sc[4] + pg_t
        sc[5] = sc[5] + v_t

    @pl.when(j == bpm - 1)
    def _apply():
        # entropy term: -ent_coef on log_std (rl/ppo._ppo_loss)
        g_ls = sc[3] - ent_coef
        # optax.clip_by_global_norm over ALL grads incl. log_std
        sq = g_ls * g_ls
        for k in range(6):
            sq = sq + jnp.sum(gs[k][:, :] * gs[k][:, :])
        gn = jnp.sqrt(sq)
        scale = jnp.where(gn > max_norm, max_norm / gn, 1.0)
        # adam with bias correction (optax.scale_by_adam + scale(-lr));
        # the 1-beta^t corrections arrive precomputed per minibatch
        c1 = stats_ref[e_i, 2]
        c2 = stats_ref[e_i, 3]
        for k in range(6):
            g = gs[k][:, :] * scale
            m_new = beta1 * ms[k][:, :] + (1.0 - beta1) * g
            v_new = beta2 * vs[k][:, :] + (1.0 - beta2) * g * g
            ms[k][:, :] = m_new
            vs[k][:, :] = v_new
            ws[k][:, :] -= lr * (m_new / c1) / (jnp.sqrt(v_new / c2) + eps)
        g = g_ls * scale
        m_new = beta1 * sc[1] + (1.0 - beta1) * g
        v_new = beta2 * sc[2] + (1.0 - beta2) * g * g
        sc[1] = m_new
        sc[2] = v_new
        sc[0] = sc[0] - lr * (m_new / c1) / (jnp.sqrt(v_new / c2) + eps)
        # aux row: pg_loss, v_loss, entropy at the loss-time log_std
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        row = (
            jnp.where(lane == 0, sc[4] * inv_n, 0.0)
            + jnp.where(lane == 1, sc[5] * inv_n, 0.0)
            + jnp.where(
                lane == 2, log_std + 0.5 * (_LOG_2PI + 1.0), 0.0
            )
            + jnp.where(lane == 3, gn, 0.0)
        )
        aux_out[pl.ds(e_i, 1), :] = row

    @pl.when(t == S - 1)
    def _store():
        for k in range(6):
            wout[k][:, :] = ws[k][:, :]
            mout[k][:, :] = ms[k][:, :]
            vout[k][:, :] = vs[k][:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        ls_out[:, :] = (
            jnp.where(lane == 0, sc[0], 0.0)
            + jnp.where(lane == 1, sc[1], 0.0)
            + jnp.where(lane == 2, sc[2], 0.0)
        )


def ppo_epoch_update(
    packed_fm: jnp.ndarray,  # [FM_ROWS, N] feature-major FULL buffer (f32)
    perm_all: jnp.ndarray,  # [E*MB*bpm] i32 gathered-block schedule
    block_rows: int,
    bpm: int,  # shuffle blocks per minibatch
    stats: jnp.ndarray,  # [E*MB, 2] f32: (adv_mean, adv_rstd) per minibatch
    weights: tuple,  # (w1t [H,8], b1 [H,1], w2t, b2, wht [2,H], bh [2,1])
    mu: tuple,  # adam first moments, same shapes/layouts as weights
    nu: tuple,  # adam second moments
    ls: jnp.ndarray,  # [3] f32: log_std, m_ls, v_ls
    *,
    mb_rows: int,
    lr: float,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: float = 0.5,
    ent_coef: float = 1e-3,
    adam_count,  # traced or static int: optimizer steps taken so far
    act: str = "relu",
    clip_eps: float = 0.2,
    vf_coef: float = 0.5,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """The WHOLE PPO learner — every epoch, minibatch grad step, global-norm
    clip, and adam update — as one pallas kernel launch.  Weight/moment
    state rides VMEM scratch across the grid; the caller supplies the full
    gathered-block schedule (``perm_all``) and per-minibatch advantage
    stats.  Returns (weights', mu', nu', ls', aux [E*MB, 8])."""
    S = perm_all.shape[0]
    n_mb = S // bpm
    H = weights[0].shape[0]
    f32 = jnp.float32
    bs = int(block_rows)

    hyper = jnp.stack(
        [
            jnp.asarray(1.0 / mb_rows, f32),
            jnp.asarray(lr, f32),
            jnp.asarray(beta1, f32),
            jnp.asarray(beta2, f32),
            jnp.asarray(eps, f32),
            jnp.asarray(max_grad_norm, f32),
            jnp.asarray(ent_coef, f32),
            jnp.asarray(0.0, f32),
        ]
    ).reshape(1, 8)
    # adam bias corrections per minibatch, precomputed (no powf in Mosaic)
    k = jnp.arange(n_mb, dtype=f32)
    t_adam = jnp.asarray(adam_count, f32) + k + 1.0
    c1 = 1.0 - jnp.power(jnp.asarray(beta1, f32), t_adam)
    c2 = 1.0 - jnp.power(jnp.asarray(beta2, f32), t_adam)
    stats = jnp.concatenate(
        [stats.astype(f32), c1[:, None], c2[:, None]], axis=1
    )

    shapes = [(H, 8), (H, 1), (H, H), (H, 1), (2, H), (2, 1)]
    kernel = functools.partial(
        _epoch_kernel,
        bpm=int(bpm),
        act=act,
        clip_eps=float(clip_eps),
        vf_coef=float(vf_coef),
        compute_dtype=compute_dtype,
    )
    const = lambda t, perm: (0, 0)
    wspec = [pl.BlockSpec(s, const) for s in shapes]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((n_mb, 4), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((FM_ROWS, bs), lambda t, perm: (0, perm[t])),
            *wspec,  # weights in
            *wspec,  # mu in
            *wspec,  # nu in
        ],
        out_specs=[
            *wspec,  # weights out
            *wspec,  # mu out
            *wspec,  # nu out
            pl.BlockSpec((1, 4), const),
            pl.BlockSpec((n_mb, 8), const),
        ],
        scratch_shapes=(
            [pltpu.VMEM(s, f32) for s in shapes] * 3  # W, M, V
            + [pltpu.VMEM(s, f32) for s in shapes]  # G
            + [pltpu.SMEM((8,), f32)]
        ),
    )
    out_shape = (
        [jax.ShapeDtypeStruct(s, f32) for s in shapes] * 3
        + [jax.ShapeDtypeStruct((1, 4), f32)]
        + [jax.ShapeDtypeStruct((n_mb, 8), f32)]
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        perm_all.astype(jnp.int32),
        stats.astype(f32),
        hyper,
        jnp.asarray(ls, f32).reshape(1, 3),
        packed_fm,
        *[w.astype(f32) for w in weights],
        *[m.astype(f32) for m in mu],
        *[v.astype(f32) for v in nu],
    )
    w_out = tuple(outs[0:6])
    m_out = tuple(outs[6:12])
    v_out = tuple(outs[12:18])
    ls_out = outs[18][0, :3]
    aux = outs[19]
    return w_out, m_out, v_out, ls_out, aux
