#!/usr/bin/env python3
"""Summarize graft.Explain output into a per-query plan-shape table
(exchanges, broadcasts, join strategies, scans, rank pushdowns)."""
import re, subprocess, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = subprocess.run(["sbt", f"runMain graft.Explain {sf}"],
                     capture_output=True, text=True, cwd="/root/repo")
txt = "\n".join(l for l in (out.stdout + out.stderr).splitlines())
blocks = re.split(r"======== (\S+) ========", txt)[1:]
print("| query | shuffles | single-part | broadcasts | BNLJ | SMJ | scans | WindowGroupLimit |")
print("|---|---|---|---|---|---|---|---|")
for name, body in zip(blocks[::2], blocks[1::2]):
    def nodes(label):
        return len(re.findall(r"\(\d+\) " + label + r"\s*$", body, re.M))
    ex = len(re.findall(r"Arguments: hashpartitioning", body))
    sp = len(re.findall(r"Arguments: SinglePartition", body))
    print(f"| {name} | {ex} | {sp} | {nodes('BroadcastExchange')} | "
          f"{nodes('BroadcastNestedLoopJoin')} | {nodes('SortMergeJoin')} | "
          f"{nodes('Scan parquet')} | {nodes('WindowGroupLimit')} |")
