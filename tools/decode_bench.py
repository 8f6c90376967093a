#!/usr/bin/env python3
"""Decode the compact bench telemetry line back to named per-query times.

The bench stdout `{"metric":"qtimes",...}` line carries EVERY query's
wall time as a positional integer array `t` (unit in `t_unit`: cs/ds/s)
in the deterministic run order — queries run sorted by name — plus the
`probes` series of [suite_offset_sec, calib_cpu_sec] pairs taken every
50 queries (the mid-run box-speed instrument).

Position i names the i-th key, sorted, of the SAME round's
CORRECTNESS_r{N}.json (the driver emits both from one commit, and the
query surfaces coincide). Usage:

    tools/decode_bench.py BENCH_r16.json CORRECTNESS_r16.json

Prints one `name seconds` line per query (slowest first) and the probe
series, ready for round-over-round diffing.
"""
import json
import re
import sys


def qtimes_line(bench_path):
    with open(bench_path) as f:
        doc = json.load(f)
    # the driver artifact wraps the captured log tail; a raw bench
    # stdout line also parses directly
    if isinstance(doc, dict) and "tail" in doc:
        m = None
        for m in re.finditer(r'\{"metric":"qtimes".*?\}(?=\n|$)', doc["tail"]):
            pass
        if m is None:
            raise SystemExit(f"no qtimes line in {bench_path} tail")
        return json.loads(m.group(0))
    return doc


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    q = qtimes_line(sys.argv[1])
    with open(sys.argv[2]) as f:
        names = sorted(json.load(f).keys())
    if len(names) != q["n"]:
        raise SystemExit(
            f"surface mismatch: {len(names)} correctness rows vs n={q['n']} — "
            "use the SAME round's CORRECTNESS json")
    scale = {"cs": 100.0, "ds": 10.0, "s": 1.0}[q["t_unit"]]
    timed = [
        (name, t / scale if t >= 0 else -1.0)
        for name, t in zip(names, q["t"])
    ]
    for name, sec in sorted(timed, key=lambda kv: -kv[1]):
        print(f"{sec:10.2f}  {name}")
    print(f"\ntotal {q['value']} sec over {q['n']} queries")
    for off, calib in q.get("probes", []):
        print(f"probe @{off:7.1f}s  calib_cpu {calib:.2f}s")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into head is fine
        pass
