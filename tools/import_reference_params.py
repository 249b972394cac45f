#!/usr/bin/env python
"""Import the UVA/Padova parameter tables from the reference simglucose checkout.

The reference ships four CSV parameter tables (clinical data, not code):
  - vpatient_params.csv : 30 virtual patients x 61 columns (13 initial states +
    kinetic parameters)            [reference: simglucose/params/vpatient_params.csv]
  - Quest.csv           : per-patient CR/CF/Age/TDI therapy parameters
                                   [reference: simglucose/params/Quest.csv]
  - sensor_params.csv   : CGM sensor noise/sampling parameters (3 sensors)
                                   [reference: simglucose/params/sensor_params.csv]
  - pump_params.csv     : insulin pump quantization limits (2 pumps)
                                   [reference: simglucose/params/pump_params.csv]

This script converts them into the JSON record format used by
``simglucose_tpu/params``.  Run once at build time:

    python tools/import_reference_params.py [--reference /root/reference]
"""
import argparse
import json
import os

import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "simglucose_tpu", "params", "data")


def df_to_records(df: pd.DataFrame) -> dict:
    """Convert a params table to {"fields": [...], "records": [{...}, ...]}."""
    fields = [str(c).strip() for c in df.columns]
    records = []
    for _, row in df.iterrows():
        rec = {}
        for raw_col, field in zip(df.columns, fields):
            v = row[raw_col]
            if hasattr(v, "item"):
                v = v.item()
            rec[field] = v
        records.append(rec)
    return {"fields": fields, "records": records}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    src = os.path.join(args.reference, "simglucose", "params")
    os.makedirs(OUT_DIR, exist_ok=True)

    tables = {
        "vpatient_params.csv": "vpatient.json",
        "Quest.csv": "quest.json",
        "sensor_params.csv": "sensor.json",
        "pump_params.csv": "pump.json",
    }
    for csv_name, json_name in tables.items():
        df = pd.read_csv(os.path.join(src, csv_name))
        # Normalize the reference's quirky "x0_ 1" style column names.
        df.columns = [str(c).replace(" ", "") for c in df.columns]
        payload = {
            "provenance": (
                "UVA/Padova 2008 simulator parameter table, imported from "
                f"simglucose params/{csv_name}"
            ),
            **df_to_records(df),
        }
        out_path = os.path.join(OUT_DIR, json_name)
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {out_path} ({len(payload['records'])} records)")


if __name__ == "__main__":
    main()
