"""Parameter table loaders: shapes, names, spot values vs the reference CSVs."""
import numpy as np
import pytest

from simglucose_tpu import params as tables


def test_patient_names():
    names = tables.patient_names()
    assert len(names) == 30
    assert names[0] == "adolescent#001"
    assert names[10] == "adult#001"
    assert names[20] == "child#001"


def test_load_single_patient():
    p = tables.load_patient_params("adolescent#001", dtype=np.float64)
    assert p.x0.shape == (1, 13)
    # reference params/vpatient_params.csv row 2
    assert p.BW[0] == pytest.approx(68.706)
    assert p.u2ss[0] == pytest.approx(1.21697571391)
    assert p.x0[0, 12] == pytest.approx(250.621836)
    assert p.x0[0, 3] == pytest.approx(250.621836)
    # steady-state basal (BASELINE.md): u2ss*BW/6000 = 0.013933...
    assert p.u2ss[0] * p.BW[0] / 6000 == pytest.approx(0.0139355889, abs=1e-9)


def test_load_batch_and_ids():
    p = tables.load_patient_params(["adolescent#001", "adult#005", "child#010"])
    assert p.x0.shape == (3, 13)
    by_id = tables.load_patient_params([1, 15, 30])
    np.testing.assert_array_equal(p.BW, by_id.BW)


def test_quest_fallback():
    q = tables.load_quest_params(["adolescent#001", "not-a-patient"])
    assert q.CR[0] == pytest.approx(12.0)
    assert q.CR[1] == pytest.approx(1 / 15)  # 'Average' fallback
    assert q.CF[1] == pytest.approx(1 / 50)


def test_sensor_pump_tables():
    assert tables.sensor_names() == ["Dexcom", "GuardianRT", "Navigator"]
    assert tables.pump_names() == ["Cozmo", "Insulet"]
    assert tables.sensor_sample_time("Dexcom") == 3
    assert tables.sensor_sample_time("GuardianRT") == 5
    assert tables.sensor_sample_time("Navigator") == 1
    s = tables.load_sensor_params("Dexcom", dtype=np.float64)
    assert float(s.PACF) == pytest.approx(0.7)
    assert float(s.min) == 39.0 and float(s.max) == 600.0
    pu = tables.load_pump_params("Insulet", dtype=np.float64)
    assert float(pu.max_basal) == 30.0
    assert float(pu.inc_bolus) == pytest.approx(0.05)
