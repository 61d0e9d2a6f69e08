"""Summarize succ/RTE/RRE from logs_r3 eval dirs into one table."""
import glob, os, re, sys
rows = []
for d in sorted(glob.glob("/root/repo/logs_r3/eval_*") +
                glob.glob("/root/repo/logs_r3/*/eval*") ):
    logs = glob.glob(os.path.join(d, "*", "log.txt")) + glob.glob(os.path.join(d, "log.txt"))
    for lg in logs:
        txt = open(lg).read()
        m = re.findall(r"Time: ([\d.]+), RTE all: ([\d.]+), RRE all: ([\d.]+), Success: ([\d.]+) %", txt)
        succ = re.findall(r"Success rate: ([\d.]+)", txt)
        if m:
            t, rte, rre, s = m[-1]
            per_iter = " ".join(succ[-5:]) if succ else ""
            rows.append((os.path.relpath(d, "/root/repo"), s, rte, rre, per_iter))
for r in rows:
    print(f"{r[0]:45s} succ {r[1]:>7s}  rte {r[2]:>7s}  rre {r[3]:>8s}  iters [{r[4]}]")
