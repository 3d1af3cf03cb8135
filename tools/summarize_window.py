"""Summarize a tools/run_tpu_window.sh capture directory into one JSON.

Usage: python tools/summarize_window.py [benchmarks/tpu_window_*]
(defaults to the newest tpu_window_* dir). Pulls the headline numbers
out of each step's log — probe health, per-iteration profile medians,
fused-kernel VMEM ceiling, bench.py's JSON line, the BASELINE config
records, and the lane A/B — and writes <dir>/SUMMARY.json plus a
human-readable table to stdout. Purely a log parser: safe to run
anywhere, no device needed.
"""

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def last_json_line(path: pathlib.Path):
    if not path.exists():
        return None
    for line in reversed(path.read_text(errors="replace").splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def all_json_lines(path: pathlib.Path):
    out = []
    if not path.exists():
        return out
    for line in path.read_text(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def profile_medians(path: pathlib.Path):
    """'label   median   X ms  best   Y ms' lines -> {label: {median, best}}."""
    out = {}
    if not path.exists():
        return out
    pat = re.compile(r"^(.*?)\s+median\s+([\d.]+) ms\s+best\s+([\d.]+) ms")
    for line in path.read_text(errors="replace").splitlines():
        m = pat.match(line.strip())
        if m:
            out[m.group(1).strip()] = {"median_ms": float(m.group(2)),
                                       "best_ms": float(m.group(3))}
    return out


def main():
    if len(sys.argv) > 1:
        d = pathlib.Path(sys.argv[1])
    else:
        dirs = sorted((REPO / "benchmarks").glob("tpu_window_*"))
        if not dirs:
            print("no tpu_window_* capture dirs found")
            return 1
        d = dirs[-1]

    s = {"dir": str(d)}
    s["probe"] = last_json_line(d / "probe.log")
    s["profile_bees"] = profile_medians(d / "profile_iteration.log")
    s["profile_1mpix"] = profile_medians(d / "profile_iteration_1mpix.log")
    s["fused_vmem"] = last_json_line(d / "probe_fused_vmem.log")
    s["bench_fused"] = all_json_lines(d / "bench_fused.log")[-3:]
    s["bench"] = last_json_line(d / "bench.log")
    s["bench_configs"] = {
        ln.split(" ", 1)[0]: json.loads(ln.split(" ", 1)[1])
        for ln in (d / "bench_configs.log").read_text(
            errors="replace").splitlines()
        if " {" in ln and ln.split(" ", 1)[1].strip().startswith("{")
    } if (d / "bench_configs.log").exists() else None
    s["lanes_n16"] = all_json_lines(d / "bench_lanes.log")
    s["lanes_n32"] = all_json_lines(d / "bench_lanes32.log")

    out = d / "SUMMARY.json"
    out.write_text(json.dumps(s, indent=1))
    print(json.dumps(s, indent=1))
    print(f"\nwrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
