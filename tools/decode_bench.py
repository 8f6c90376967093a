#!/usr/bin/env python3
"""Decode bench telemetry back to named per-query times; diff two rounds.

The bench stdout `{"metric":"qtimes",...}` line carries EVERY query's
wall time as a positional integer array `t` (unit in `t_unit`: cs/ds/s)
in the deterministic run order — queries run sorted by name — plus the
`probes` series of [suite_offset_sec, calib_cpu_sec] pairs taken every
50 queries (the mid-run box-speed instrument). Position i names the
i-th key, sorted, of the SAME round's CORRECTNESS_r{N}.json (the driver
emits both from one commit, and the query surfaces coincide).

Pre-r16 artifacts (<= BENCH_r15) carried a NAMED slowest-first
`queries` map on the `total` line instead; the loader handles both, so
any two rounds diff.

Usage:

    tools/decode_bench.py BENCH_r17.json CORRECTNESS_r17.json
    tools/decode_bench.py BENCH_r17.json CORRECTNESS_r17.json \
        --vs BENCH_r16.json CORRECTNESS_r16.json

Single-round: one `name seconds` line per query (slowest first) plus
the probe series. --vs: per-query ratios (slowest regression first),
family sums, and the two calibration/probe series side by side — the
table every round-over-round adjudication starts from.
"""
import json
import re
import sys


def _tail(bench_path):
    with open(bench_path) as f:
        doc = json.load(f)
    # the driver artifact wraps the captured log tail; a raw bench
    # stdout line also parses directly
    if isinstance(doc, dict) and "tail" in doc:
        return doc["tail"], None
    return None, doc


def _headline_calib(text):
    """calib_* / ann_build fields off the short `total` headline line."""
    calib = {}
    for m in re.finditer(r'"((?:calib|ann)_\w+?_sec)":(-?[\d.]+)', text):
        calib[m.group(1)] = float(m.group(2))
    return calib


def load_round(bench_path, corr_path):
    """-> dict(times={name: sec}, total, n, probes, calib, errors)."""
    tail, doc = _tail(bench_path)
    if doc is None:
        # r16+ compact positional line
        m = None
        for m in re.finditer(r'\{"metric":"qtimes".*?\}(?=\n|$)', tail):
            pass
        if m is not None:
            doc = json.loads(m.group(0))
        else:
            # pre-r16: named `queries` map on the total line; the tail
            # may clip the line's FRONT, so parse from the last
            # `"queries":{` object instead of requiring a whole line
            i = tail.rfind('"queries":{')
            if i < 0:
                raise SystemExit(f"no qtimes/queries payload in {bench_path}")
            qmap, _ = json.JSONDecoder().raw_decode(tail, i + len('"queries":'))
            # the total that belongs to THIS queries map is on the same
            # line, before it — a tail holding two runs' emissions must
            # not pair run 1's headline with run 2's map
            tm = None
            for tm in re.finditer(r'"metric":"total","value":([\d.]+)',
                                  tail[:i]):
                pass
            doc = {"named": qmap,
                   "value": float(tm.group(1)) if tm else sum(qmap.values())}
    # the full-precision backup artifact (target/bench.json) carries a
    # named `queries` map plus probes/errors/calib at the top level
    if doc is not None and "queries" in doc and "t" not in doc:
        doc = {"named": doc["queries"], "value": doc["value"],
               "probes": doc.get("probes", []),
               "errors": doc.get("errors", {}),
               "calib": {k: float(v) for k, v in doc.items()
                         if re.fullmatch(r"(?:calib|ann)_\w+_sec", k)}}
    calib = doc.get("calib") if isinstance(doc, dict) and doc.get("calib") \
        else _headline_calib(tail or "")
    if "named" in doc:
        times = {k: float(v) for k, v in doc["named"].items()}
        return dict(times=times, total=doc["value"], n=len(times),
                    probes=doc.get("probes", []), calib=calib,
                    errors=doc.get("errors", {}), res=0.001)
    with open(corr_path) as f:
        names = sorted(json.load(f).keys())
    if len(names) != doc["n"]:
        raise SystemExit(
            f"surface mismatch: {len(names)} correctness rows vs n={doc['n']}"
            f" — use the SAME round's CORRECTNESS json as {bench_path}")
    scale = {"cs": 100.0, "ds": 10.0, "s": 1.0}[doc["t_unit"]]
    times = {name: (t / scale if t >= 0 else -1.0)
             for name, t in zip(names, doc["t"])}
    errors = doc.get("errors", {}) \
        if isinstance(doc.get("errors"), dict) else {}
    return dict(times=times, total=doc["value"], n=doc["n"],
                probes=doc.get("probes", []), calib=calib, errors=errors,
                res=1.0 / scale)


def family(name):
    return name.split("_", 1)[0]


def show_round(r):
    for name, sec in sorted(r["times"].items(), key=lambda kv: -kv[1]):
        print(f"{sec:10.2f}  {name}")
    print(f"\ntotal {r['total']} sec over {r['n']} queries")
    for name, msg in r.get("errors", {}).items():
        print(f"ERROR {name}: {msg}")
    _show_calib(r)


def _show_calib(r):
    if r["calib"]:
        print("calib: " + "  ".join(
            f"{k.replace('_sec', '')}={v:.2f}" for k, v in r["calib"].items()))
    for off, calib in r["probes"]:
        print(f"probe @{off:7.1f}s  calib_cpu {calib:.2f}s")


def show_vs(cur, prev):
    """Per-query ratios (cur/prev, slowest regression first), family
    sums, calibration series side by side."""
    shared = sorted(set(cur["times"]) & set(prev["times"]))
    # floors scale with the COARSER round's decode resolution (cs/ds/s
    # positional artifacts round to a tick; a 0-decoded time must not
    # manufacture an infinite "regression" above real ones)
    floor = max(cur.get("res", 0.01), prev.get("res", 0.01))
    rows = []
    noise = 0
    for name in shared:
        a, b = cur["times"][name], prev["times"][name]
        if a < 0 or b < 0:
            continue  # errored on one side; listed below
        if a < 5 * floor and b < 5 * floor:
            noise += 1  # both under the resolution floor: ratio is noise
            continue
        rows.append((a / max(b, floor), a, b, name))
    print(f"{'ratio':>7} {'cur_s':>8} {'prev_s':>8}  query "
          f"({len(shared)} shared, {noise} sub-resolution skipped)")
    for ratio, a, b, name in sorted(rows, key=lambda r: -r[0]):
        print(f"{ratio:7.2f} {a:8.2f} {b:8.2f}  {name}")
    only_cur = sorted(set(cur["times"]) - set(prev["times"]))
    only_prev = sorted(set(prev["times"]) - set(cur["times"]))
    errored = sorted([n for n in shared
                      if cur["times"][n] < 0 or prev["times"][n] < 0])
    def _only(label, names, times):
        if not names:
            return
        tot = sum(times[n] for n in names if times[n] >= 0)
        if len(names) <= 20:
            print(f"\nonly in {label} ({len(names)}, {tot:.2f}s): " +
                  ", ".join(f"{n} ({times[n]:.2f}s)" for n in names))
        else:
            # a pre-r16 selective artifact leaves hundreds unshared —
            # summarize instead of flooding the diff
            print(f"\nonly in {label}: {len(names)} queries, {tot:.2f}s "
                  f"(e.g. " + ", ".join(names[:5]) + ", ...)")
    _only("current", only_cur, cur["times"])
    _only("previous", only_prev, prev["times"])
    if errored:
        msgs = {**prev.get("errors", {}), **cur.get("errors", {})}
        print("errored (−1) on one side: " + ", ".join(
            f"{n} [{msgs[n]}]" if n in msgs else n for n in errored))

    fams = {}
    for name in shared:
        a, b = cur["times"][name], prev["times"][name]
        if a < 0 or b < 0:
            continue
        fa = fams.setdefault(family(name), [0.0, 0.0, 0])
        fa[0] += a
        fa[1] += b
        fa[2] += 1
    print(f"\n{'family':<10} {'n':>4} {'cur_s':>9} {'prev_s':>9} {'ratio':>7}")
    for fam in sorted(fams, key=lambda f: -(fams[f][0] - fams[f][1])):
        a, b, n = fams[fam]
        print(f"{fam:<10} {n:>4} {a:9.2f} {b:9.2f} "
              f"{(a / b if b > 0 else float('inf')):7.2f}")
    # shared non-errored queries only, so the ratio compares like with
    # like; the headline totals (full surfaces) print beside it
    ta = sum(v[0] for v in fams.values())
    tb = sum(v[1] for v in fams.values())
    print(f"{'SHARED':<10} {sum(v[2] for v in fams.values()):>4} "
          f"{ta:9.2f} {tb:9.2f} {(ta / tb if tb else 0):7.2f}   "
          f"(headline totals {cur['total']} vs {prev['total']})")

    print("\ncurrent round instruments:")
    _show_calib(cur)
    print("previous round instruments:")
    _show_calib(prev)


def main():
    if len(sys.argv) == 3:
        show_round(load_round(sys.argv[1], sys.argv[2]))
    elif len(sys.argv) == 6 and sys.argv[3] == "--vs":
        show_vs(load_round(sys.argv[1], sys.argv[2]),
                load_round(sys.argv[4], sys.argv[5]))
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into head is fine
        pass
