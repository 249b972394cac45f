"""Pump quantization and risk index parity."""
import jax.numpy as jnp
import numpy as np
import pytest

from simglucose_tpu.analysis.risk import risk_index, risk_scalar
from simglucose_tpu.devices.pump import pump_basal, pump_bolus
from simglucose_tpu.params import load_pump_params, pump_record


def _ref_quantize(amount, inc, lo, hi):
    """The reference's formula (actuator/pump.py:23-39), in numpy."""
    v = amount * 6000.0
    v = np.round(v / inc) * inc
    v = v / 6000.0
    return np.minimum(np.maximum(v, lo), hi)


@pytest.mark.parametrize("pump", ["Cozmo", "Insulet"])
def test_pump_quantization_bitexact(pump):
    params = load_pump_params(pump, dtype=np.float64)
    rec = pump_record(pump)
    amounts = np.concatenate(
        [
            np.linspace(-1.0, 40.0, 2001),
            np.asarray([0.0, 0.013933333333, 1e-9, 100.0]),
        ]
    )
    ours_b = np.asarray(pump_basal(params, jnp.asarray(amounts)))
    ref_b = _ref_quantize(
        amounts, rec["inc_basal"], rec["min_basal"], rec["max_basal"]
    )
    np.testing.assert_array_equal(ours_b, ref_b)
    ours_o = np.asarray(pump_bolus(params, jnp.asarray(amounts)))
    ref_o = _ref_quantize(
        amounts, rec["inc_bolus"], rec["min_bolus"], rec["max_bolus"]
    )
    np.testing.assert_array_equal(ours_o, ref_o)


def _ref_risk(BG, horizon):
    """Reference risk (analysis/risk.py:5-17), in numpy."""
    BG_to_compute = np.asarray(BG, dtype=float)[-horizon:]
    with np.errstate(all="ignore"):
        fBG = 1.509 * (np.log(BG_to_compute) ** 1.084 - 5.381)
    rl = 10 * fBG[fBG < 0] ** 2
    rh = 10 * fBG[fBG > 0] ** 2
    LBGI = np.nan_to_num(np.mean(rl) if len(rl) else np.nan)
    HBGI = np.nan_to_num(np.mean(rh) if len(rh) else np.nan)
    return LBGI, HBGI, LBGI + HBGI


def test_risk_scalar_matches_reference():
    for bg in [40.0, 70.0, 112.5, 140.0, 180.0, 350.0, 600.0, 149.02]:
        l, h, r = (float(x) for x in risk_scalar(jnp.float64(bg)))
        rl, rh, rr = _ref_risk([bg], 1)
        assert l == pytest.approx(rl, rel=1e-12)
        assert h == pytest.approx(rh, rel=1e-12)
        assert r == pytest.approx(rr, rel=1e-12)
    # BASELINE.md: BG=149.02 -> Risk 2.7552758979034984
    _, _, r = risk_scalar(jnp.float64(149.02))
    assert float(r) == pytest.approx(2.7552758979034984, rel=1e-12)


def test_risk_index_window():
    rng = np.random.RandomState(0)
    bg = rng.uniform(45, 400, size=50)
    for horizon in [1, 5, 50]:
        l, h, r = (float(x) for x in risk_index(jnp.asarray(bg), horizon))
        rl, rh, rr = _ref_risk(bg, horizon)
        assert l == pytest.approx(rl, rel=1e-12)
        assert h == pytest.approx(rh, rel=1e-12)
        assert r == pytest.approx(rr, rel=1e-12)
