"""Summarize the round-3 chip-queue outputs into one markdown report.

Reads (all optional — missing files are skipped):
  /tmp/bench_experiments_r3.log   — "=== <header>" lines + JSON rows
  /tmp/model_bench_r3_sweepA.log  — per-family JSON rows (sweep A)
  /tmp/model_bench_r3_sweepB.log  — sweep B (reproducibility check)
  /tmp/bench_preview_r3.json      — bench.py preview line

Usage: python tools/r3_report.py [--out R3_CHIP_REPORT.md]
"""

from __future__ import annotations

import argparse
import json
import os


def _json_rows(path):
    rows = []
    if not os.path.exists(path):
        return rows
    header = ""
    for ln in open(path):
        ln = ln.strip()
        if ln.startswith("==="):
            header = ln.lstrip("= ").strip()
        elif ln.startswith("{"):
            try:
                rows.append((header, json.loads(ln)))
            except json.JSONDecodeError:
                pass
    return rows


def _fmt(r):
    return (f"{r.get('steps_per_sec', '?')} steps/s "
            f"({r.get('ms_per_step', '?')} ms, accum {r.get('grad_accum')}, "
            f"mfu {r.get('mfu', '-')})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    lines = ["# Round-3 chip results", ""]

    exps = _json_rows("/tmp/bench_experiments_r3.log")
    if exps:
        lines += ["## Experiments (A/B)", "",
                  "| run | model | result |", "|---|---|---|"]
        for header, r in exps:
            if "error" in r:
                lines.append(f"| {header} | {r.get('model')} | "
                             f"ERROR {r['error'][:60]} |")
            else:
                lines.append(f"| {header} | {r.get('model')} | {_fmt(r)} |")
        lines.append("")

    a = {r.get("model"): r for _, r in _json_rows("/tmp/model_bench_r3_sweepA.log")}
    b = {r.get("model"): r for _, r in _json_rows("/tmp/model_bench_r3_sweepB.log")}
    if a:
        lines += ["## Sweep A vs B (reproducibility)", "",
                  "| model | sweep A | sweep B | delta |", "|---|---|---|---|"]
        for m, ra in a.items():
            rb = b.get(m)
            sa = ra.get("steps_per_sec")
            sb = rb.get("steps_per_sec") if rb else None
            if isinstance(sa, (int, float)) and isinstance(sb, (int, float)):
                d = f"{abs(sa - sb) / max(sa, 1e-9):.1%}"
            else:
                d = "-"
            lines.append(f"| {m} | {sa} | {sb if rb else '-'} | {d} |")
        lines.append("")

    if os.path.exists("/tmp/bench_preview_r3.json"):
        for ln in open("/tmp/bench_preview_r3.json"):
            if ln.strip().startswith("{"):
                lines += ["## bench.py preview", "", "```json",
                          ln.strip(), "```", ""]
                break

    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
