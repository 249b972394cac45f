"""Host-side harness for running the *reference* simglucose (read-only at
/root/reference) to generate golden fixtures.

The reference targets gym==0.9.4 / old pandas; this harness installs small
stand-in modules (gym registration no-op, pkg_resources path resolver) so the
reference imports under the current environment, and constructs patients with
an explicit numpy init_state to sidestep a pandas-3.x positional-indexing
incompatibility in the reference's ``reset()``.

Only used offline by tools/gen_golden.py — never imported by the framework.
"""
import os
import sys
import types

REFERENCE = os.environ.get("SIMGLUCOSE_REFERENCE", "/root/reference")


def install():
    if "simglucose" in sys.modules:
        return
    gym = types.ModuleType("gym")
    envs = types.ModuleType("gym.envs")
    reg = types.ModuleType("gym.envs.registration")
    reg.register = lambda **kw: None
    gym.envs = envs
    envs.registration = reg
    pkgres = types.ModuleType("pkg_resources")
    pkgres.resource_filename = lambda pkg, path: os.path.join(REFERENCE, pkg, path)
    sys.modules.setdefault("gym", gym)
    sys.modules.setdefault("gym.envs", envs)
    sys.modules.setdefault("gym.envs.registration", reg)
    sys.modules.setdefault("pkg_resources", pkgres)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def make_patient(name, **kwargs):
    """Reference T1DPatient with numpy init_state (pandas-3.x safe)."""
    install()
    import pandas as pd
    from simglucose.patient.t1dpatient import T1DPatient

    params = pd.read_csv(
        os.path.join(REFERENCE, "simglucose", "params", "vpatient_params.csv")
    )
    row = params.loc[params.Name == name].squeeze()
    if "init_state" not in kwargs:
        kwargs["init_state"] = row.iloc[2:15].to_numpy(dtype=float)
    return T1DPatient(row, **kwargs)
