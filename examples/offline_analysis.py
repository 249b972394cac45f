"""Re-analyze saved results CSVs offline
(capability parity: reference examples/offline_analysis.py)."""
import glob
import os

import pandas as pd

from simglucose_tpu.analysis.report import report

result_dir = "./results"
csvs = [
    f
    for f in glob.glob(os.path.join(result_dir, "*#*.csv"))
]
if not csvs:
    raise SystemExit(f"no per-patient CSVs under {result_dir}; run "
                     "examples/advanced_tutorial.py first")
names = [os.path.splitext(os.path.basename(f))[0] for f in csvs]
df = pd.concat(
    [pd.read_csv(f, index_col="Time", parse_dates=True) for f in csvs],
    keys=names,
)
results, ri_per_hour, zone_stats, figs, axes = report(df, save_path=result_dir)
print(results)
