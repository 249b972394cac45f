#!/usr/bin/env python
"""Generate golden fixtures by running the reference simglucose on host.

Outputs land in tests/golden/ as .npz / .csv files.  Each fixture encodes the
exact behavior of the reference at fixed seeds; the framework's tests assert
parity against them (tolerance for ODE physics, bitwise for RNG-driven paths).

Fixtures:
  openloop_<name>.npz      : 1000-min open-loop patient trace (basal insulin,
                             80 g meal at t=100 with matching bolus — the
                             reference's own demo, t1dpatient.py:284-323),
                             storing BG[t] and the full 13-state trajectory.
  cgm_noise.npz            : first N CGM noise values for each sensor, seeds
                             1-3 (sensor/noise_gen.py semantics).
  meals_seed<k>_<start>.npz: minute-wise meal grams over 3 days from
                             RandomScenario (simulation/scenario_gen.py).
  closedloop_golden.csv    : the canonical 2-day closed-loop trace
                             (adolescent#001, Dexcom seed 1, scenario seed 1,
                             BBController, start 2018-01-01 00:00) — same
                             config as reference tests/test_sim_engine.py:88-113.
  init_bg.npz              : random_init_bg multivariate-normal draws, seeds 0-4.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refharness

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "golden")


def gen_openloop():
    from simglucose.patient.t1dpatient import Action

    for name in ["adolescent#001", "adult#005", "child#003"]:
        p = refharness.make_patient(name)
        basal = float(p._params.u2ss * p._params.BW / 6000)
        T = 1000
        bg = np.zeros(T)
        xs = np.zeros((T, 13))
        for i in range(T):
            ins, carb = basal, 0.0
            if p.t == 100:
                carb = 80.0
                ins = 80.0 / 6.0 + basal
            p.step(Action(insulin=ins, CHO=carb))
            bg[i] = p.observation.Gsub
            xs[i] = p.state
        path = os.path.join(OUT, f"openloop_{name.replace('#','_')}.npz")
        np.savez_compressed(path, BG=bg, X=xs, basal=basal)
        print("wrote", path, "BG[-1]=%.12f" % bg[-1])


def gen_cgm_noise(n=200):
    import pandas as pd
    from simglucose.sensor.noise_gen import CGMNoise

    sensors = pd.read_csv(
        os.path.join(refharness.REFERENCE, "simglucose/params/sensor_params.csv")
    )
    out = {}
    for _, row in sensors.iterrows():
        for seed in [1, 2, 3]:
            gen = CGMNoise(row, seed=seed)
            out[f"{row.Name}_s{seed}"] = np.array([next(gen) for _ in range(n)])
    path = os.path.join(OUT, "cgm_noise.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


def gen_meals():
    from datetime import datetime, timedelta

    from simglucose.simulation.scenario_gen import RandomScenario

    for seed in [1, 2]:
        for hour in [0, 6, 23]:
            start = datetime(2018, 1, 1, hour, 0, 0)
            sc = RandomScenario(start_time=start, seed=seed)
            T = 3 * 24 * 60
            meals = np.zeros(T)
            t = start
            for i in range(T):
                meals[i] = sc.get_action(t).meal
                t += timedelta(minutes=1)
            path = os.path.join(OUT, f"meals_seed{seed}_h{hour}.npz")
            np.savez_compressed(path, meals=meals)
            print("wrote", path, "total CHO=%.1f" % meals.sum())


def gen_closedloop():
    from datetime import datetime, timedelta

    import pandas as pd
    from simglucose.actuator.pump import InsulinPump
    from simglucose.controller.basal_bolus_ctrller import BBController
    from simglucose.sensor.cgm import CGMSensor
    from simglucose.simulation.env import T1DSimEnv
    from simglucose.simulation.scenario_gen import RandomScenario
    from simglucose.simulation.sim_engine import SimObj

    start = datetime(2018, 1, 1, 0, 0, 0)
    patient = refharness.make_patient("adolescent#001")
    sensor = CGMSensor.withName("Dexcom", seed=1)
    pump = InsulinPump.withName("Insulet")
    scenario = RandomScenario(start_time=start, seed=1)
    env = T1DSimEnv(patient, sensor, pump, scenario)
    ctrl = BBController()
    obj = SimObj(env, ctrl, timedelta(days=2), animate=False, path=None)
    obj.simulate()
    df = obj.results()
    path = os.path.join(OUT, "closedloop_golden.csv")
    df.to_csv(path)
    # full-precision arrays (the CSV truncates doubles at ~16 digits)
    npz = os.path.join(OUT, "closedloop_golden.npz")
    np.savez_compressed(
        npz,
        BG=df.BG.to_numpy(),
        CGM=df.CGM.to_numpy(),
        CHO=df.CHO.to_numpy(),
        insulin=df.insulin.to_numpy(),
        LBGI=df.LBGI.to_numpy(),
        HBGI=df.HBGI.to_numpy(),
        Risk=df.Risk.to_numpy(),
    )
    print("wrote", path, f"rows={len(df)} BG0={df.BG.iloc[0]} CGM0={df.CGM.iloc[0]}")


def gen_closedloop_variants():
    """Closed-loop day traces across patients AND sensor hardware (different
    sample_time -> different framework scan shapes): adult#005 + GuardianRT
    (5 min), child#003 + Navigator (1 min)."""
    from datetime import datetime, timedelta

    from simglucose.actuator.pump import InsulinPump
    from simglucose.controller.basal_bolus_ctrller import BBController
    from simglucose.sensor.cgm import CGMSensor
    from simglucose.simulation.env import T1DSimEnv
    from simglucose.simulation.scenario_gen import RandomScenario
    from simglucose.simulation.sim_engine import SimObj

    configs = [
        ("adult#005", "GuardianRT", 2, 2),
        ("child#003", "Navigator", 3, 5),
    ]
    for pname, sname, cgm_seed, scen_seed in configs:
        start = datetime(2018, 1, 1, 0, 0, 0)
        patient = refharness.make_patient(pname)
        sensor = CGMSensor.withName(sname, seed=cgm_seed)
        pump = InsulinPump.withName("Insulet")
        scenario = RandomScenario(start_time=start, seed=scen_seed)
        env = T1DSimEnv(patient, sensor, pump, scenario)
        obj = SimObj(env, BBController(), timedelta(days=1), animate=False, path=None)
        obj.simulate()
        df = obj.results()
        tag = f"{pname.replace('#', '_')}_{sname}"
        npz = os.path.join(OUT, f"closedloop_{tag}.npz")
        np.savez_compressed(
            npz,
            BG=df.BG.to_numpy(),
            CGM=df.CGM.to_numpy(),
            CHO=df.CHO.to_numpy(),
            insulin=df.insulin.to_numpy(),
            Risk=df.Risk.to_numpy(),
        )
        print("wrote", npz, f"rows={len(df)} BG0={df.BG.iloc[0]}")


def gen_cohort():
    """30-patient x 24h BBController cohort through the reference's OWN
    batch_sim + report machinery (reference: simulation/user_interface.py:
    364-385, tests/test_sim_engine.py:24-113): per-patient traces +
    performance_stats / risk_trace / CVGA_stats goldens for the
    simulate()-level end-to-end parity test (tests/test_cohort_golden.py).

    Seeds mirror the reference's simulate(): every patient's sensor gets the
    SAME cgm seed (user_interface.py:366) and a deepcopy of the SAME
    RandomScenario (user_interface.py:368) — seed 1 / seed 1 here.
    """
    import copy
    import shutil
    import tempfile
    from datetime import datetime, timedelta

    import matplotlib

    matplotlib.use("Agg")
    import pandas as pd
    from simglucose.actuator.pump import InsulinPump
    from simglucose.analysis.report import report
    from simglucose.controller.basal_bolus_ctrller import BBController
    from simglucose.sensor.cgm import CGMSensor
    from simglucose.simulation.env import T1DSimEnv
    from simglucose.simulation.scenario_gen import RandomScenario
    from simglucose.simulation.sim_engine import SimObj, batch_sim

    start = datetime(2018, 1, 1, 0, 0, 0)
    params = pd.read_csv(
        os.path.join(refharness.REFERENCE, "simglucose/params/vpatient_params.csv")
    )
    names = list(params.Name)
    scenario = RandomScenario(start_time=start, seed=1)
    sim_path = tempfile.mkdtemp()  # sim() insists on saving per-patient CSVs
    objs = []
    for name in names:
        patient = refharness.make_patient(name)
        sensor = CGMSensor.withName("Dexcom", seed=1)
        pump = InsulinPump.withName("Insulet")
        env = T1DSimEnv(patient, sensor, pump, copy.deepcopy(scenario))
        objs.append(
            SimObj(env, BBController(), timedelta(days=1), animate=False,
                   path=sim_path)
        )
    results = batch_sim(objs, parallel=False)
    df = pd.concat(results, keys=names)
    shutil.rmtree(sim_path, ignore_errors=True)

    out = {}
    for name in names:
        sub = df.loc[name]
        for col in ("BG", "CGM", "CHO", "insulin", "LBGI", "HBGI", "Risk"):
            out[f"{name}/{col}"] = sub[col].to_numpy()
    npz = os.path.join(OUT, "cohort_golden.npz")
    np.savez_compressed(npz, **out)

    # The reference's risk_index_trace relies on legacy numpy/pandas
    # semantics where np.mean(DataFrame) reduced per column
    # (reference: analysis/report.py:99-101); restore that behavior for the
    # duration of the report call.
    orig_mean = np.mean

    def _mean_compat(a, *args, **kw):
        if isinstance(a, pd.DataFrame) and not args and not kw:
            return a.mean()
        return orig_mean(a, *args, **kw)

    tmp = tempfile.mkdtemp()
    np.mean = _mean_compat
    try:
        report(df, tmp)
    finally:
        np.mean = orig_mean
    for f in ("performance_stats.csv", "risk_trace.csv", "CVGA_stats.csv"):
        shutil.copy(os.path.join(tmp, f), os.path.join(OUT, "cohort_" + f))
    shutil.rmtree(tmp, ignore_errors=True)
    print("wrote", npz, f"({len(names)} patients, {len(df)} rows) + report CSVs")


def gen_init_bg():
    out = {}
    params = refharness.make_patient("adolescent#001")._params
    x0 = np.array([params[f"x0_{i}"] if f"x0_{i}" in params else params[f"x0_ {i}"]
                   for i in range(1, 14)], dtype=float)
    for seed in range(5):
        rs = np.random.RandomState(seed)
        mean = [1.0 * x0[3], 1.0 * x0[4], 1.0 * x0[12]]
        cov = np.diag([0.1 * x0[3], 0.1 * x0[4], 0.1 * x0[12]])
        out[f"s{seed}"] = rs.multivariate_normal(mean, cov)
    path = os.path.join(OUT, "init_bg.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    refharness.install()
    os.makedirs(OUT, exist_ok=True)
    which = sys.argv[1:] or ["openloop", "cgm_noise", "meals", "closedloop", "init_bg"]
    for w in which:
        globals()[f"gen_{w}"]()
