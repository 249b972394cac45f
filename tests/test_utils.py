"""Utils lookups (reference: utils.py:10-27) and profiling meter."""
import numpy as np
import pandas as pd

from simglucose_tpu.utils import (
    fetch_patient_params,
    fetch_patient_quest,
    lookup_patient_meta_data,
)
from simglucose_tpu.utils.profiling import Throughput


def test_fetch_patient_params():
    p = fetch_patient_params("adolescent#001")
    assert p["Name"] == "adolescent#001"
    assert abs(p["BW"] - 68.706) < 0.01
    assert abs(p["u2ss"] - 1.217) < 0.01
    assert len([k for k in p if k.startswith("x0_")]) == 13


def test_fetch_patient_quest_and_fallback():
    q = fetch_patient_quest("adolescent#001")
    assert q["CR"] > 0 and q["CF"] > 0
    avg = fetch_patient_quest("nobody#999")
    assert avg["Name"] == "Average"


def test_lookup_patient_meta_data():
    df = pd.DataFrame(
        {"Name": ["a#1", "b#2"], "Age": [14, 40], "TDI": [30.0, 50.0]}
    )
    row = lookup_patient_meta_data(df, "b#2")
    assert row["Age"] == 40 and row["TDI"] == 50.0


def test_throughput_meter():
    m = Throughput(batch=100, steps_per_call=10)
    m.start()
    m.stop(calls=3)
    assert m.env_steps == 3000
    assert np.isfinite(m.steps_per_sec) and m.steps_per_sec > 0
