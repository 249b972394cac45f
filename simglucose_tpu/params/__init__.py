"""Parameter tables and loaders.

The UVA/Padova clinical parameter tables (30 virtual patients, 3 CGM sensors,
2 insulin pumps, Quest therapy table) live in ``data/*.json``; see
``tools/import_reference_params.py`` for provenance.  Loaders return
struct-of-array pytrees batched over the requested patient names so a single
compiled kernel serves any cohort mix.

Reference parity: patient/t1dpatient.py:44-68 (withName/withID selection),
sensor/cgm.py:20-24, actuator/pump.py:17-21, controller/basal_bolus_ctrller.py:52-62.
"""
from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import List, Sequence, Union

import numpy as np

from simglucose_tpu.core.types import (
    PatientParams,
    PumpParams,
    QuestParams,
    SensorParams,
)

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

# Quest fallback for unknown patient names
# (reference: controller/basal_bolus_ctrller.py:59-62)
AVERAGE_QUEST = {"Name": "Average", "CR": 1 / 15, "CF": 1 / 50, "TDI": 50, "Age": 30}
AVERAGE_U2SS = 1.43  # pmol/(L*kg)
AVERAGE_BW = 57.0  # kg


@lru_cache(maxsize=None)
def load_table(table: str) -> tuple:
    """Load a raw params table: 'vpatient', 'quest', 'sensor', or 'pump'.

    Returns a tuple of record dicts (tuple so it is hashable/cacheable).
    """
    path = os.path.join(_DATA_DIR, f"{table}.json")
    with open(path) as f:
        payload = json.load(f)
    return tuple(payload["records"])


def _by_name(table: str) -> dict:
    return {rec["Name"]: rec for rec in load_table(table)}


def patient_names() -> List[str]:
    """All 30 virtual patient names (adolescent/adult/child #001-#010)."""
    return [rec["Name"] for rec in load_table("vpatient")]


def sensor_names() -> List[str]:
    return [rec["Name"] for rec in load_table("sensor")]


def pump_names() -> List[str]:
    return [rec["Name"] for rec in load_table("pump")]


def patient_record(name: str) -> dict:
    """Raw parameter record for one patient (all 61 columns)."""
    return dict(_by_name("vpatient")[name])


def quest_record(name: str) -> dict:
    """Quest therapy record; falls back to the 'Average' patient for unknown
    names (reference: basal_bolus_ctrller.py:59-62)."""
    return dict(_by_name("quest").get(name, AVERAGE_QUEST))


def _resolve_names(names: Union[str, int, Sequence]) -> List[str]:
    """Accept a name, an id (1-30, reference t1dpatient.py:44-55), or a list."""
    if isinstance(names, (str, int, np.integer)):
        names = [names]
    all_names = patient_names()
    out = []
    for n in names:
        if isinstance(n, (int, np.integer)):
            if not 1 <= int(n) <= len(all_names):
                raise ValueError(f"patient id must be in 1..{len(all_names)}, got {n}")
            out.append(all_names[int(n) - 1])
        else:
            out.append(str(n))
    return out


def load_patient_params(
    names: Union[str, int, Sequence], dtype=np.float32
) -> PatientParams:
    """Build a batched :class:`PatientParams` for the given patient names.

    ``names`` may be a single name/id or a sequence; fields come out with a
    leading batch axis ``[B]`` (``x0`` is ``[B, 13]``).  A single name yields
    B == 1; squeeze at the call site if scalar params are wanted.
    """
    names = _resolve_names(names)
    table = _by_name("vpatient")
    rows = []
    for n in names:
        if n not in table:
            raise KeyError(
                f"unknown patient {n!r}; valid names: {patient_names()[:3]}..."
            )
        rows.append(table[n])

    def col(c):
        return np.asarray([r[c] for r in rows], dtype=dtype)

    x0 = np.stack([col(f"x0_{i}") for i in range(1, 14)], axis=-1)
    kwargs = {"x0": x0}
    for field in PatientParams._fields:
        if field == "x0":
            continue
        kwargs[field] = col(field)
    return PatientParams(**kwargs)


def load_quest_params(
    names: Union[str, int, Sequence], dtype=np.float32
) -> QuestParams:
    """Batched Quest therapy params with 'Average' fallback."""
    names = _resolve_names(names)
    recs = [quest_record(n) for n in names]

    def col(c):
        return np.asarray([r[c] for r in recs], dtype=dtype)

    return QuestParams(CR=col("CR"), CF=col("CF"), Age=col("Age"), TDI=col("TDI"))


def sensor_record(name: str) -> dict:
    return dict(_by_name("sensor")[name])


def load_sensor_params(name: str, dtype=np.float32) -> SensorParams:
    """Scalar SensorParams for one sensor model.  ``sample_time`` is returned
    separately by :func:`sensor_sample_time` because it must stay static."""
    rec = sensor_record(name)
    return SensorParams(
        PACF=np.asarray(rec["PACF"], dtype),
        gamma=np.asarray(rec["gamma"], dtype),
        lam=np.asarray(rec["lambda"], dtype),
        delta=np.asarray(rec["delta"], dtype),
        xi=np.asarray(rec["xi"], dtype),
        min=np.asarray(rec["min"], dtype),
        max=np.asarray(rec["max"], dtype),
    )


def sensor_sample_time(name: str) -> int:
    """CGM sampling period in minutes (Dexcom=3, GuardianRT=5, Navigator=1)."""
    return int(sensor_record(name)["sample_time"])


def pump_record(name: str) -> dict:
    return dict(_by_name("pump")[name])


def load_pump_params(name: str, dtype=np.float32) -> PumpParams:
    rec = pump_record(name)
    return PumpParams(
        min_bolus=np.asarray(rec["min_bolus"], dtype),
        max_bolus=np.asarray(rec["max_bolus"], dtype),
        inc_bolus=np.asarray(rec["inc_bolus"], dtype),
        min_basal=np.asarray(rec["min_basal"], dtype),
        max_basal=np.asarray(rec["max_basal"], dtype),
        inc_basal=np.asarray(rec["inc_basal"], dtype),
    )
