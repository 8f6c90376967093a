#!/usr/bin/env python3
"""Decode bench telemetry back to named per-query times; diff two rounds.

The bench stdout `{"metric":"qtimes",...}` line carries EVERY query's
wall time as a positional integer array `t` (unit in `t_unit`: cs/ds/s)
in the deterministic run order — queries run sorted by name — plus the
instrument payload: `cpu` (the ProbeEvery=50-interval calib series as
positional centisecond ints; offsets reconstruct from cumsum(t) at the
probe boundaries), `spk` (the start/mid/end Spark-path brackets, cs
ints), `rpt` (flat [idx, t, ...] pairs — a second sample for the ~10
slowest queries, same unit as `t`) and, only when a query failed,
`errt` (flat [idx, t, ...] pairs: the errored queries' real elapsed,
conserved in offset reconstruction). Position i names the i-th key,
sorted, of the SAME round's CORRECTNESS_r{N}.json (the driver emits
both from one commit, and the query surfaces coincide).

Pre-r18 artifacts carried a `probes` series of [offset, calib] pairs
and no repeats; pre-r16 artifacts (<= BENCH_r15) carried a NAMED
slowest-first `queries` map on the `total` line instead. The loader
handles all three, so any two rounds diff.

Usage:

    tools/decode_bench.py BENCH_r18.json CORRECTNESS_r18.json
    tools/decode_bench.py BENCH_r18.json CORRECTNESS_r18.json \
        --vs BENCH_r17.json CORRECTNESS_r17.json

Single-round: one `name seconds` line per query (slowest first) plus
the instrument series and repeat samples. --vs: per-query ratios
(slowest regression first) with each tail regression labeled
repeat-confirmed / first-sample-only when the current round carries a
repeat for it, family sums, raw AND wall-conserving totals (adding
back the out-of-window ann/fixtures/repeat seconds), and the
calibration series side by side — the table every round-over-round
adjudication starts from.
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
    """Every *_sec field off the short `total` headline line (calib_*,
    ann_build, fixtures_build, repeats — match generically so a new
    field never silently drops, the r17 ADVICE failure mode)."""
    calib = {}
    for m in re.finditer(r'"(\w+_sec)":(-?[\d.]+)', text):
        calib[m.group(1)] = float(m.group(2))
    return calib


def load_round(bench_path, corr_path):
    """-> dict(times={name: sec}, total, n, probes, calib, errors,
    repeats={name: sec}, spk=[...])."""
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
    # named `queries` map plus probes/repeats/errors/calib at the top
    if doc is not None and "queries" in doc and "t" not in doc:
        doc = {"named": doc["queries"], "value": doc["value"],
               "probes": doc.get("probes", []),
               "named_repeats": doc.get("repeats", {}),
               "errors": doc.get("errors", {}),
               "err_wall": doc.get("err_wall", {}),
               "calib": {k: float(v) for k, v in doc.items()
                         if re.fullmatch(r"\w+_sec", k)}}
    calib = doc.get("calib") if isinstance(doc, dict) and doc.get("calib") \
        else _headline_calib(tail or "")
    if "named" in doc:
        times = {k: float(v) for k, v in doc["named"].items()}
        return dict(times=times, total=doc["value"], n=len(times),
                    probes=doc.get("probes", []), calib=calib,
                    repeats={k: float(v) for k, v in
                             doc.get("named_repeats", {}).items()},
                    err_sec=sum(float(v) for v in
                                doc.get("err_wall", {}).values()),
                    spk=[], errors=doc.get("errors", {}), res=0.001)
    with open(corr_path) as f:
        names = sorted(json.load(f).keys())
    if len(names) != doc["n"]:
        raise SystemExit(
            f"surface mismatch: {len(names)} correctness rows vs n={doc['n']}"
            f" — use the SAME round's CORRECTNESS json as {bench_path}")
    scale = {"cs": 100.0, "ds": 10.0, "s": 1.0}[doc["t_unit"]]
    times = {name: (t / scale if t >= 0 else -1.0)
             for name, t in zip(names, doc["t"])}
    # an errored query rides as t=-1 but its REAL elapsed (errt pairs,
    # r18) is excluded from the headline total — decode it once, both
    # for probe-offset reconstruction and for the wall-conserving total
    et = doc.get("errt", [])
    errw = {et[i]: et[i + 1] / scale for i in range(0, len(et) - 1, 2)}
    # probes: r17- carried [offset, calib_sec] pairs; r18+ carries the
    # positional `cpu` cs-int series — reconstruct offsets as the
    # cumsum of decoded times at the ProbeEvery=50 boundaries (hygiene
    # gaps excluded: good to a few seconds over the suite). Entries
    # past end-of-suite (the +1th and later) are post-suite samples
    # bracketing the repeat window; mark them with the full-suite sum.
    probes = doc.get("probes", [])
    post_from = len(probes)
    if not probes and "cpu" in doc:
        # errored elapsed must still count in the cumsum, or every
        # later offset reconstructs early by the seconds the failure
        # took
        tsec = [(v / scale) if v >= 0 else errw.get(i, 0.0)
                for i, v in enumerate(doc["t"])]
        n = doc["n"]
        total_t = sum(tsec)
        # in-loop probes precede queries 0, 50, ...; the next entry is
        # the end-of-suite bracket; anything after ran POST-SUITE (the
        # repeat window) — offset those by the self-reported
        # repeats_sec and tag them, so an overlay doesn't attribute a
        # repeat-window spike to the final suite queries
        n_inloop = ((n - 1) // 50 + 1) if n else 0
        post_from = n_inloop + 1
        rep_sec = max(calib.get("repeats_sec", 0.0), 0.0)
        probes = []
        for k, c in enumerate(doc["cpu"]):
            if k < n_inloop:
                off = sum(tsec[:k * 50])
            elif k == n_inloop:
                off = total_t
            else:
                off = total_t + rep_sec
            probes.append([off, c / 100.0])
    repeats = {}
    rpt = doc.get("rpt", [])
    for i in range(0, len(rpt) - 1, 2):
        idx, tv = rpt[i], rpt[i + 1]
        if 0 <= idx < len(names):
            repeats[names[idx]] = (tv / scale if tv >= 0 else -1.0)
    errors = doc.get("errors", {}) \
        if isinstance(doc.get("errors"), dict) else {}
    return dict(times=times, total=doc["value"], n=doc["n"],
                probes=probes, post_from=post_from, calib=calib,
                repeats=repeats, err_sec=sum(errw.values()),
                spk=[v / 100.0 for v in doc.get("spk", [])],
                errors=errors, res=1.0 / scale)


def family(name):
    return name.split("_", 1)[0]


def _wall_total(r):
    """The wall-conserving total: headline total plus the out-of-window
    seconds the warming/repeat passes moved out of it (r17 moved ~42 s
    of builds out of `total`; comparing raw totals across that change
    silently mis-states — r17 verdict item 3), plus any errored
    queries' real elapsed (errt, r18): the headline total filters
    t<0, so without the add-back an errored round's wall reads low
    by exactly the seconds the failures consumed."""
    extra = sum(v for k, v in r["calib"].items()
                if k in ("ann_build_sec", "fixtures_build_sec",
                         "repeats_sec") and v > 0)
    extra += r.get("err_sec", 0.0)
    try:
        return float(r["total"]) + extra
    except (TypeError, ValueError):
        return None


def show_round(r):
    for name, sec in sorted(r["times"].items(), key=lambda kv: -kv[1]):
        rep = r["repeats"].get(name)
        if rep is None:
            suffix = ""
        elif rep < 0:  # taken but errored — a finding, not a blank
            suffix = "  (repeat FAILED)"
        else:
            suffix = f"  (repeat {rep:.2f})"
        print(f"{sec:10.2f}  {name}{suffix}")
    wt = _wall_total(r)
    extra = f" (wall-conserving {wt:.1f})" if wt is not None else ""
    print(f"\ntotal {r['total']} sec over {r['n']} queries{extra}")
    for name, msg in r.get("errors", {}).items():
        print(f"ERROR {name}: {msg}")
    _show_calib(r)


def _show_calib(r):
    if r["calib"]:
        print("calib: " + "  ".join(
            f"{k.replace('_sec', '')}={v:.2f}" for k, v in r["calib"].items()))
    if r.get("spk"):
        print("spk brackets: " + "  ".join(f"{v:.2f}s" for v in r["spk"]))
    post_from = r.get("post_from", len(r["probes"]))
    for k, (off, calib) in enumerate(r["probes"]):
        tag = "  (post-suite)" if k >= post_from else ""
        print(f"probe @{off:7.1f}s  calib_cpu {calib:.2f}s{tag}")


def show_vs(cur, prev):
    """Per-query ratios (cur/prev, slowest regression first), repeat
    labels, family sums, raw + wall-conserving totals, calibration
    series side by side."""
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
        rep = cur["repeats"].get(name)
        label = ""
        if rep is not None and rep < 0:
            # a second sample was TAKEN and failed — distinct from "no
            # repeat": the repeat window itself misbehaved (the
            # restart-only-bug class the repeat pass exists to surface)
            label = "  [repeat-errored]"
        elif rep is not None and ratio > 1.25:
            # the second sample adjudicates the regression: if the
            # repeat is ALSO elevated vs the previous round the drift
            # is in the query (plan/code), if it falls back in line the
            # first sample was a scheduling hiccup (the r16/r17 class)
            rr = rep / max(b, floor)
            label = (f"  repeat {rep:.2f}s "
                     + ("[repeat-confirmed]" if rr > 1.25
                        else "[first-sample-only]"))
        elif rep is not None and rep >= 0:
            label = f"  repeat {rep:.2f}s"
        print(f"{ratio:7.2f} {a:8.2f} {b:8.2f}  {name}{label}")
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
    wa, wb = _wall_total(cur), _wall_total(prev)
    if wa is not None and wb is not None:
        print(f"{'':>10} {'':>4} {'':>9} {'':>9} {'':>7}   "
              f"(wall-conserving {wa:.1f} vs {wb:.1f} — raw totals "
              f"exclude out-of-window ann/fixtures/repeat seconds)")

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
