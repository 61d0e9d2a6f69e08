"""One-line-per-eval table from logs_r4 summary_metrics.json files."""
import glob
import json
import os

rows = []
for path in sorted(glob.glob("/root/repo/logs_r4/*/*/summary_metrics.json")):
    name = os.path.relpath(path, "/root/repo/logs_r4").split("/")[0]
    d = json.load(open(path))
    rows.append((name, d["succ"], d["err_r_deg_mean"], d["err_t_mean"]))
for name, succ, rre, rte in rows:
    print(f"{name:25s} succ {succ:6.4f}  rre {rre:8.3f}  rte {rte:7.3f}")
