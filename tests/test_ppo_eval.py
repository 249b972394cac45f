"""The shipped PPO checkpoint must be clinically competitive: evaluated
deterministically on the 30-patient cohort, its mean risk index must be at
least as good as the PID therapy baseline at the same seeds.

This is the committed proof behind the "trained policy controls glucose"
claim — the analog of the reference's published cohort stats
(reference: examples/results/2017-12-31_17-46-32/performance_stats.csv,
produced by batch_sim + report) applied to the RL policy, with the PID
controller (reference: controller/pid_ctrller.py:8-40) as the bar.

CI scale: 30 patients x 6 h (the full 24 h comparison is run by
examples/eval_ppo.py and recorded in BASELINE.md).
"""
import os

import jax
import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "examples", "checkpoints",
    "ppo_cohort_relu64.npz",
)

HOURS = 6.0
SEED = 1234


@pytest.fixture(scope="module")
def trained_policy():
    from simglucose_tpu.rl.policy import init_policy
    from simglucose_tpu.utils.checkpoint import restore_state

    if not os.path.exists(CKPT):
        pytest.fail(f"committed checkpoint missing: {CKPT}")
    # the action-decoder metadata must state the decoder the checkpoint was
    # TRAINED with (tools/train_ppo_tpu.py); policy_controller deploys it
    like = init_policy(
        jax.random.PRNGKey(0), hidden=64, act="relu",
        action_scale=10.0, scale_by_basal=True,
    )
    return restore_state(CKPT, like=like)


def test_ppo_checkpoint_beats_pid_baseline(trained_policy):
    import numpy as _np

    from simglucose_tpu import params as tables
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.rl.evaluate import (
        evaluate_controller,
        policy_controller,
    )

    names = tables.patient_names()
    # the checkpoint was trained with basal-scaled actions
    # (tools/train_ppo_tpu.py: nn_scale_by_basal, action_scale=10) — the
    # deploy form must match the training action parameterization
    basal = basal_rate(tables.load_patient_params(names, dtype=_np.float32))
    ppo = evaluate_controller(
        policy_controller(trained_policy, basal),
        names, hours=HOURS, seed=SEED,
    )
    pid = evaluate_controller("PID", names, hours=HOURS, seed=SEED)

    ppo_ri = float(ppo["risk_index"].mean())
    pid_ri = float(pid["risk_index"].mean())
    # paired comparison (identical noise/meal streams at the same seed)
    assert ppo_ri <= pid_ri, (
        f"trained policy mean RI {ppo_ri:.3f} worse than PID {pid_ri:.3f}"
    )
    # and it is actually controlling glucose, not gaming the metric:
    # no hypoglycemia epidemic, and decent time in range
    assert float(ppo["percent_below_50"].mean()) < 1.0
    assert float(ppo["percent_in_70_180"].mean()) > 50.0
    assert np.isfinite(ppo["BG"]).all()


def test_policy_controller_is_deterministic(trained_policy):
    """The eval form is deterministic: same seed -> identical trace."""
    import numpy as _np

    from simglucose_tpu import params as tables
    from simglucose_tpu.models.uva_padova import basal_rate
    from simglucose_tpu.rl.evaluate import (
        evaluate_controller,
        policy_controller,
    )

    basal = basal_rate(
        tables.load_patient_params(["adolescent#001"], dtype=_np.float32)
    )
    a = evaluate_controller(
        policy_controller(trained_policy, basal), ["adolescent#001"],
        hours=1.0, seed=3,
    )
    b = evaluate_controller(
        policy_controller(trained_policy, basal), ["adolescent#001"],
        hours=1.0, seed=3,
    )
    np.testing.assert_array_equal(a["BG"], b["BG"])


def test_evaluate_policy_kernel_interpret():
    """Kernel-engine policy evaluation (rl/evaluate.evaluate_policy_kernel):
    policy-mean actions with the stochastic env — runs any cohort size on
    the 'nn' kernel.  Mean-action mode must be action-deterministic (same
    seed -> same trace) while sampling mode differs at the same seed."""
    import jax
    import numpy as np

    from simglucose_tpu.rl.evaluate import evaluate_policy_kernel
    from simglucose_tpu.rl.policy import init_policy

    policy = init_policy(
        jax.random.PRNGKey(0), hidden=8, act="relu", init_mu_bias=-2.2
    )
    names = ["adolescent#001", "adult#003", "child#007"]
    hours = 4 * 3 / 60.0  # 4 Dexcom steps
    out1 = evaluate_policy_kernel(
        policy, names, hours=hours, seed=5, interpret=True, shard=False, t_chunk=1
    )
    out2 = evaluate_policy_kernel(
        policy, names, hours=hours, seed=5, interpret=True, shard=False, t_chunk=1
    )
    assert out1["BG"].shape == (3, 4)
    assert np.isfinite(out1["BG"]).all()
    assert (out1["BG"] > 10).all() and (out1["BG"] < 600).all()
    assert set(out1) >= {"percent_in_70_180", "LBGI", "HBGI", "risk_index"}
    # mean-action mode: same seed -> identical traces (actions carry no RNG)
    np.testing.assert_array_equal(out1["BG"], out2["BG"])
    np.testing.assert_array_equal(out1["insulin_mean"], out2["insulin_mean"])
