"""rllab `Step` shim (reference: simulation/env.py:9-20)."""
import numpy as np

from simglucose_tpu.envs.rllab_compat import Step, step_result_to_rllab


def test_step_tuple_contract():
    s = Step(observation=1.0, reward=-0.5, done=False, bg=140.0, risk=1.2)
    assert s.observation == 1.0
    assert s.reward == -0.5
    assert s.done is False
    assert s.info == {"bg": 140.0, "risk": 1.2}
    # namedtuple unpacking, like rllab consumers do
    obs, rew, done, info = s
    assert info["bg"] == 140.0


def test_step_result_converter():
    import jax

    from simglucose_tpu.controllers.functional import bb_controller
    from simglucose_tpu.envs.build import make_env
    from simglucose_tpu.envs.functional import env_reset

    cfg, params = make_env("adolescent#001", dtype=np.float32)
    _, res = jax.jit(lambda p, k: env_reset(cfg, p, k))(
        params, jax.random.PRNGKey(0)
    )
    s = step_result_to_rllab(res, sample_time=cfg.sample_time,
                             patient_name="adolescent#001")
    assert s.done is False and s.reward == 0.0
    assert s.info["sample_time"] == cfg.sample_time
    assert 100.0 < s.info["bg"] < 200.0
    assert s.info["risk"] == float(res.risk)
