"""Diff two bench.py JSON lines and flag per-query regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold_pct]

Reads the driver's BENCH_r{N}.json artifacts (or any bench.py output
line), prints per-query deltas, and exits 1 if any shared query
REGRESSED: slowed by more than ``threshold_pct`` (default 15, the
VERDICT regression bar) AND landed outside the old run's noise band.
bench.py emits ``query_band`` ([min, max] across its timed passes) —
a delta whose new best time still overlaps the old band is co-tenant
load, printed as ``noisy`` and NOT exit-coded (host noise on the
shared box is ±25%). Old artifacts without a band degrade to the
plain threshold rule. When both artifacts carry ``host_calib`` (CPU
speed probes — rounds land on heterogeneous VMs with a measured
3-4× single-thread spread), new times are divided by the
single-thread ratio before the band test, so a slower host doesn't
read as a code regression; a faster host never hides one (ratio
floors at 1).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    # the driver's BENCH_r{N}.json wraps the bench line: {..., "parsed":
    # {...}, "tail": "<stderr+json>"}; bare bench.py output is the line
    # itself, possibly surrounded by logs
    try:
        doc = json.loads(txt)
        if isinstance(doc, dict):
            if "queries" in doc:
                return doc
            if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
                return doc["parsed"]
            tail = doc.get("tail", "")
            i = tail.rfind('{"metric"')
            if i >= 0:
                return json.loads(tail[i:])
    except json.JSONDecodeError:
        pass
    # tolerate logs around the JSON line: take the last line that parses
    for line in reversed(txt.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no bench JSON line found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    oq, nq = old.get("queries", {}), new.get("queries", {})
    oband = old.get("query_band", {})
    if not oband and isinstance(old.get("qmax"), list):
        # compact driver line (round 8+): queries[q] is the best-of-N
        # minimum and "qmax" is the band max ALIGNED to the key order of
        # "queries" — reconstruct the [min, max] band from the pair.
        # Length guard: a re-serialized artifact (e.g. jq -S sorts keys)
        # or a truncated qmax would silently pair maxima with the wrong
        # queries; better to degrade to the bandless threshold rule.
        if len(old["qmax"]) == len(oq):
            oband = {
                q: [v, hi]
                for (q, v), hi in zip(oq.items(), old["qmax"])
            }
        else:
            print(
                f"WARNING: qmax length {len(old['qmax'])} != queries "
                f"{len(oq)} — alignment unknown, ignoring bands"
            )
    # host-speed normalization: when both artifacts carry the CPU
    # calibration probe, a slower NEW host scales every wall time up by
    # roughly the single-thread ratio (fixed per-stage cost dominates at
    # bench SF) — divide new times by the ratio before the band test so
    # a 3x-slower VM doesn't read as 40 regressions. Only ratios > 1
    # apply: a FASTER host must never hide a real regression.
    ratio = 1.0
    hc_o, hc_n = old.get("host_calib") or {}, new.get("host_calib") or {}
    if hc_o.get("st_sec") and hc_n.get("st_sec"):
        ratio = max(1.0, hc_n["st_sec"] / hc_o["st_sec"])
    # multicore steal shows up in the ALL-CORE probe while the
    # single-thread probe stays flat (round-8: mt 0.44→0.78 s with st
    # unchanged read as 41 "regressions" — every one environmental).
    # Suite entries are parallel-stage-bound, so a delta inside the old
    # band at the mt ratio is classified noisy too — but labeled
    # distinctly (noisy-mt): it is WEAKER evidence than the st rule, so
    # re-measure on a quiet host before trusting it.
    mt_ratio = 1.0
    if hc_o.get("mt_sec") and hc_n.get("mt_sec"):
        mt_ratio = max(1.0, hc_n["mt_sec"] / hc_o["mt_sec"])
    shared = sorted(set(oq) & set(nq))
    flagged, noisy = [], []
    print(f"{'query':32s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for name in shared:
        a, b = oq[name], nq[name]
        if not a:
            # 0.000 baselines carry no signal: any nonzero new timing
            # would be an infinite "regression" — flag it explicitly
            # rather than hiding it behind +0.0%
            if b > 0.05:
                flagged.append((name, float("inf")))
                print(f"{name:32s} {a:8.3f} {b:8.3f}     n/a  <-- REGRESSED (zero baseline)")
            else:
                print(f"{name:32s} {a:8.3f} {b:8.3f}     n/a")
            continue
        pct = (b - a) / a * 100.0
        mark = ""
        if pct > thresh:
            # band rule: the old artifact's worst pass bounds what pure
            # host noise looked like DURING the old run; a new best time
            # inside that band is indistinguishable from load
            old_hi = max(oband.get(name, [a, a]))
            if b <= old_hi:
                noisy.append((name, pct))
                mark = "  (noisy: inside old band)"
            elif b / ratio <= old_hi:
                noisy.append((name, pct))
                mark = f"  (noisy: inside old band at host ratio {ratio:.2f}x)"
            elif b / mt_ratio <= old_hi:
                noisy.append((name, pct))
                mark = (
                    f"  (noisy-mt: inside old band at all-core ratio"
                    f" {mt_ratio:.2f}x — re-measure on a quiet host)"
                )
            else:
                flagged.append((name, pct))
                mark = "  <-- REGRESSED"
        print(f"{name:32s} {a:8.3f} {b:8.3f} {pct:+7.1f}%{mark}")
    for name in sorted(set(nq) - set(oq)):
        print(f"{name:32s} {'—':>8s} {nq[name]:8.3f}     NEW")
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:32s} {oq[name]:8.3f} {'—':>8s}     REMOVED")
    co, cn = old.get("core_value"), new.get("core_value")
    if co and cn:
        print(f"\ncore_value {co:.3f} -> {cn:.3f} ({(cn - co) / co * 100:+.1f}%)")
    so, sn = old.get("value"), new.get("value")
    if so is not None and sn is not None:
        print(f"suite {so:.3f} -> {sn:.3f}")
    la_o, la_n = old.get("loadavg"), new.get("loadavg")
    if la_o or la_n:
        print(f"loadavg old={la_o} new={la_n}")
    if hc_o or hc_n:
        print(f"host_calib old={hc_o} new={hc_n} -> ratio {ratio:.2f}x")
    if noisy:
        print(f"\nnoisy (> {thresh:.0f}% but inside old band — likely load): "
              + ", ".join(f"{n} ({p:+.0f}%)" for n, p in noisy))
    if flagged:
        print(f"\nREGRESSIONS (> {thresh:.0f}% and outside old band): "
              + ", ".join(f"{n} ({p:+.0f}%)" for n, p in flagged))
        return 1
    print(f"\nno shared query regressed > {thresh:.0f}% beyond the old band")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
