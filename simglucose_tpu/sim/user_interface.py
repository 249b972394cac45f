"""Interactive CLI wizard over :func:`simglucose_tpu.sim.engine.simulate`.

Capability parity with the reference's interactive entry point
(reference: simulation/user_interface.py:29-404): any argument left unset is
prompted for with a numbered `input()` wizard; everything then routes into
the one-compiled-program cohort simulation.
"""
from __future__ import annotations

from datetime import datetime, timedelta
from typing import Optional

from simglucose_tpu import params as tables
from simglucose_tpu.sim.engine import simulate as _simulate


def _pick_from(prompt: str, choices: list, allow_multi: bool = False):
    """Numbered selection wizard (reference: user_interface.py:29-93)."""
    while True:
        print(prompt)
        for i, c in enumerate(choices):
            print(f"[{i + 1}] {c}")
        raw = input(">>> ").strip()
        try:
            if allow_multi:
                idxs = [int(tok) for tok in raw.replace(",", " ").split()]
                if all(1 <= i <= len(choices) for i in idxs) and idxs:
                    return [choices[i - 1] for i in idxs]
            else:
                i = int(raw)
                if 1 <= i <= len(choices):
                    return choices[i - 1]
        except ValueError:
            pass
        print("Invalid input, please try again.")


def pick_patients():
    groups = ["adolescent", "adult", "child", "all", "select individual"]
    g = _pick_from("Select virtual patients:", groups)
    names = tables.patient_names()
    if g == "all":
        return names
    if g == "select individual":
        return _pick_from("Select patients:", names, allow_multi=True)
    return [n for n in names if n.startswith(g)]


def pick_cgm_sensor() -> str:
    return _pick_from("Select the CGM sensor:", tables.sensor_names())


def pick_cgm_seed() -> int:
    while True:
        raw = input("Random seed for the CGM sensor [enter for 0]: ").strip()
        if not raw:
            return 0
        try:
            return int(raw)
        except ValueError:
            print("Invalid input, please enter an integer.")


def pick_insulin_pump() -> str:
    return _pick_from("Select the insulin pump:", tables.pump_names())


def pick_scenario():
    kind = _pick_from(
        "Select scenario:", ["Random Scenario", "Custom Scenario"]
    )
    if kind == "Random Scenario":
        return None
    meals = []
    while True:
        t = input("Meal time in hours since start (enter to finish): ").strip()
        if not t:
            break
        amt = input("Meal size in grams: ").strip()
        try:
            meals.append((float(t), float(amt)))
        except ValueError:
            print("Invalid input, please try again.")
    return meals


def pick_start_time() -> datetime:
    while True:
        raw = input(
            "Simulation start time as HH (enter for 00): "
        ).strip()
        if not raw:
            return datetime(2018, 1, 1, 0, 0, 0)
        try:
            return datetime(2018, 1, 1, int(raw) % 24, 0, 0)
        except ValueError:
            print("Invalid input, please try again.")


def pick_sim_time() -> timedelta:
    while True:
        raw = input("Simulation time in hours [enter for 24]: ").strip()
        if not raw:
            return timedelta(hours=24)
        try:
            return timedelta(hours=float(raw))
        except ValueError:
            print("Invalid input, please try again.")


def pick_controller():
    return _pick_from(
        "Select controller:", ["Basal-Bolus Controller", "PID Controller"]
    ).split()[0].replace("Basal-Bolus", "BB")


def pick_save_path() -> Optional[str]:
    raw = input("Folder to save results [enter to skip]: ").strip()
    return raw or None


def pick_animate() -> bool:
    return input("Show live animation? (y/N) ").strip().lower() == "y"


def pick_parallel() -> bool:
    return input("Use parallel simulation? (Y/n) ").strip().lower() != "n"


def simulate(
    sim_time: Optional[timedelta] = None,
    scenario="__unset__",
    scenario_seed: Optional[int] = None,
    controller=None,
    patient_names=None,
    cgm_name: Optional[str] = None,
    cgm_seed: Optional[int] = None,
    insulin_pump_name: Optional[str] = None,
    start_time: Optional[datetime] = None,
    save_path: Optional[str] = "__unset__",
    animate: Optional[bool] = None,
    parallel: Optional[bool] = None,
    **kwargs,
):
    """Interactive-capable top-level simulate (reference:
    user_interface.py:303-385): prompts for anything left unset, then runs
    the cohort as one compiled program and writes the analysis report."""
    if sim_time is None:
        sim_time = pick_sim_time()
    if scenario == "__unset__":
        scenario = pick_scenario()
    if controller is None:
        controller = pick_controller()
    if patient_names is None:
        patient_names = pick_patients()
    if cgm_name is None:
        cgm_name = pick_cgm_sensor()
    if cgm_seed is None:
        cgm_seed = pick_cgm_seed()
    if insulin_pump_name is None:
        insulin_pump_name = pick_insulin_pump()
    if start_time is None:
        start_time = pick_start_time()
    if save_path == "__unset__":
        save_path = pick_save_path()
    if animate is None:
        animate = pick_animate()
    if parallel is None:
        parallel = pick_parallel()

    return _simulate(
        sim_time=sim_time,
        scenario=scenario,
        scenario_seed=scenario_seed,
        controller=controller,
        patient_names=patient_names,
        cgm_name=cgm_name,
        cgm_seed=cgm_seed,
        insulin_pump_name=insulin_pump_name,
        start_time=start_time,
        save_path=save_path,
        animate=animate,
        parallel=parallel,
        **kwargs,
    )


def main():  # pragma: no cover
    import logging

    logging.basicConfig(level=logging.INFO)
    simulate()


if __name__ == "__main__":  # pragma: no cover
    main()
