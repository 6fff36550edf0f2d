#!/usr/bin/env python3
"""benchcheck.py — automated driver-bench attribution (round-11, verdict task 1).

Joins a driver BENCH_r{N}.json against the three local artifacts that
explain per-key timing moves, and classifies every visible key so a
box-drift round (r10: +40% uniform) can never mask a real plan
regression — and a real regression can never hide behind "the box is
noisy":

  inside-warm-band    driver time is the builder's warm band scaled by
                      the round's GLOBAL drift factor (median ratio of
                      driver time / builder warm median over all keys —
                      uniform drift is box, not plans) plus per-key
                      slack.
  cold-attributable   key's local capture shows a big cold/warm gap
                      (stored-artifact build, first-plan codegen); the
                      driver number is consistent with paying cold.
  fingerprint-changed the local bench_detail shuffle fingerprint moved
                      vs BASELINE.md's table (>0.2% rel AND >64 KB abs;
                      the AQE-flicker keys carry both accepted values) —
                      a PLAN change: points at the commit to re-justify.
  UNEXPLAINED         none of the above. Investigate before shipping.

Usage:
  python3 tools/benchcheck.py BENCH_r11.json \
      [--detail bench_detail.json] [--baseline BASELINE.md] \
      [--prev BENCH_r10.json] [--slack 0.6] [--abs-floor 0.35]

Exit code 1 iff any UNEXPLAINED key remains.

Sources joined (all committed in-repo):
  * BASELINE.md "per-key warm bands" table — three-run min–max of the
    warm (median-of-later-passes) time at the driver config.
  * BASELINE.md "per-key shuffle fingerprint" tables — expected
    deterministic shr/shw per key (flat table + the "old → new"
    reductions table; the arrow's right side is current).
  * bench_detail.json — the FULL-surface local capture at the driver
    config committed each round close ({med, cold, warm, shr, shw,
    spill} per key).
"""
import argparse
import json
import re
import statistics
import sys

DASH = "–"  # en-dash used in the band column


def parse_baseline(path):
    """Return (warm_bands, fingerprints).

    warm_bands: {key: (median, lo, hi)} seconds.
    fingerprints: {key: [(shr_mb, shw_mb), ...]} — a list because the
    documented AQE-flicker keys have two accepted values.

    Later sections SUPERSEDE earlier ones per key: a regenerated
    round-N table (tools/rebaseline.py appends one each round) replaces
    a key's older band/fingerprint instead of widening the accepted
    set — a stale expectation must not keep blessing an old plan.
    """
    bands, fps = {}, {}
    fp_section = {}  # key -> section id that last wrote it
    section, section_id = None, 0
    for line in open(path, encoding="utf-8"):
        if line.startswith("## "):
            low = line.lower()
            section_id += 1
            if "warm band" in low:
                section = "bands"
            elif "shuffle fingerprint" in low:
                section = "fps"
            else:
                section = None
            continue
        if not line.startswith("|") or section is None:
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 3 or cells[0] in ("key", "---") or set(cells[0]) <= {"-"}:
            continue
        key = cells[0]
        if section == "bands":
            m = re.match(r"^([\d.]+)\s*[%s-]\s*([\d.]+)$" % DASH, cells[2])
            if m and re.match(r"^[\d.]+$", cells[1]):
                bands[key] = (float(cells[1]), float(m.group(1)), float(m.group(2)))
        elif section == "fps":
            # flat rows: "| key | 5.24 | 5.24 |"
            # reduction rows: "| key | 108.06 → 36.90 (solo) / 60.01 (…) | … | how |"
            def nums(cell):
                if "→" in cell:  # arrow: accept every number on the right side
                    cell = cell.split("→", 1)[1]
                return [float(x) for x in re.findall(r"[\d]+\.[\d]+", cell)]

            rs, ws = nums(cells[1]), nums(cells[2])
            if rs and ws:
                # pair positionally; pad the shorter list with its last value
                n = max(len(rs), len(ws))
                rs += [rs[-1]] * (n - len(rs))
                ws += [ws[-1]] * (n - len(ws))
                if fp_section.get(key, section_id) != section_id:
                    fps[key] = []  # newer section supersedes
                fp_section[key] = section_id
                fps.setdefault(key, []).extend(zip(rs, ws))
    return bands, fps


def fingerprint_moved(key, detail, fps, rel_tol=0.002, abs_tol=64 * 1024):
    """None if no expectation exists; else (moved?, detail_mb, expected_list)."""
    if key not in fps or key not in detail:
        return None
    got_r = detail[key].get("shr", 0) / 1e6
    got_w = detail[key].get("shw", 0) / 1e6
    for exp_r, exp_w in fps[key]:
        ok = True
        for got, exp in ((got_r, exp_r), (got_w, exp_w)):
            diff = abs(got - exp)
            if diff > max(rel_tol * max(exp, got), abs_tol / 1e6):
                ok = False
        if ok:
            return (False, (got_r, got_w), fps[key])
    return (True, (got_r, got_w), fps[key])


def selftest(args):
    """Negative control: inject a synthetic ×5 regression into the given
    bench file's slowest banded key and require the classifier to flag
    it UNEXPLAINED (and the untouched file to classify clean). Guards
    against the tool drifting into a rubber stamp as slack/floor are
    tuned."""
    import copy
    import subprocess
    base = json.load(open(args.bench))
    bands, _ = parse_baseline(args.baseline)
    qs = base.get("parsed", base)["queries"]
    victim = max((k for k in qs if k in bands), key=lambda k: qs[k])
    bad = copy.deepcopy(base)
    bad["parsed"]["queries"][victim] = qs[victim] * 5.0
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(bad, f)
        badpath = f.name
    me = __file__
    clean = subprocess.run(["python3", me, args.bench,
                            "--baseline", args.baseline,
                            "--detail", args.detail]).returncode
    dirty = subprocess.run(["python3", me, badpath,
                            "--baseline", args.baseline,
                            "--detail", args.detail]).returncode
    ok = clean == 0 and dirty == 1
    print(f"selftest: clean-run exit {clean} (want 0), "
          f"injected ×5 on '{victim}' exit {dirty} (want 1) -> "
          f"{'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--detail", default="bench_detail.json")
    ap.add_argument("--baseline", default="BASELINE.md")
    ap.add_argument("--prev", default=None)
    ap.add_argument("--slack", type=float, default=0.6,
                    help="per-key multiplicative slack beyond global drift "
                         "(driver per-key noise is large; the signal for a "
                         "real regression is slack+absolute floor together)")
    ap.add_argument("--abs-floor", type=float, default=0.35,
                    help="seconds a key must exceed its scaled band by "
                         "before it can be UNEXPLAINED")
    ap.add_argument("--selftest", action="store_true",
                    help="negative control: verify an injected ×5 "
                         "regression on the slowest banded key is "
                         "flagged UNEXPLAINED")
    args = ap.parse_args()
    if args.selftest:
        selftest(args)

    bench = json.load(open(args.bench))
    parsed = bench.get("parsed", bench)
    times = {k: float(v) for k, v in parsed.get("queries", {}).items()
             if isinstance(v, (int, float)) and v >= 0}
    bands, fps = parse_baseline(args.baseline)
    try:
        detail = json.load(open(args.detail)).get("queries", {})
    except FileNotFoundError:
        detail = {}
    prev = {}
    if args.prev:
        prev = {k: float(v) for k, v in
                json.load(open(args.prev)).get("parsed", {}).get("queries", {}).items()}

    # Global drift: median driver/warm ratio over banded keys. Uniform
    # drift is the box (container, cpu steal); per-key residuals are us.
    ratios = {k: times[k] / bands[k][0] for k in times if k in bands and bands[k][0] > 0}
    drift = statistics.median(ratios.values()) if ratios else 1.0

    classes = {"inside-warm-band": [], "faster-than-band": [],
               "cold-attributable": [], "fingerprint-changed": [],
               "UNEXPLAINED": [], "no-yardstick": []}
    fp_moves = []
    for k in sorted(times, key=lambda x: -times[x]):
        t = times[k]
        fp = fingerprint_moved(k, detail, fps)
        if fp and fp[0]:
            fp_moves.append((k, fp[1], fp[2]))
        if k in bands:
            med, lo, hi = bands[k]
            ceil = hi * drift * (1 + args.slack) + args.abs_floor
            floor = lo * drift / (1 + args.slack) - args.abs_floor
            if floor <= t <= ceil:
                classes["inside-warm-band"].append((k, t, med * drift))
                continue
            if t < floor:
                # faster than the scaled band: informational, not fatal
                # (e.g. a stored artifact pre-built by the driver's
                # Verify pass ahead of Bench) — but listed, because a
                # plan doing LESS WORK than it should also lands here
                # and the fingerprint column is the cross-check.
                classes["faster-than-band"].append((k, t, med * drift))
                continue
        if k in detail:
            cold, warm = detail[k].get("cold", 0), detail[k].get("warm", 0)
            if warm > 0 and cold / warm > 1.8 and t <= cold * drift * (1 + args.slack) + args.abs_floor:
                classes["cold-attributable"].append((k, t, cold * drift))
                continue
        if fp and fp[0]:
            classes["fingerprint-changed"].append((k, t, fp[1]))
            continue
        if k not in bands and k not in detail:
            classes["no-yardstick"].append((k, t, None))
            continue
        classes["UNEXPLAINED"].append((k, t, bands.get(k, (0, 0, 0))[0] * drift))

    total = parsed.get("value")
    print(f"benchcheck: {args.bench}  total={total}s  keys={len(times)}  "
          f"global-drift×{drift:.2f} (median driver/warm over {len(ratios)} banded keys)")
    if prev:
        common = [k for k in times if k in prev and prev[k] > 0]
        if common:
            r = statistics.median(times[k] / prev[k] for k in common)
            print(f"  vs {args.prev}: median per-key ratio {r:.2f} over {len(common)} common keys")
    for name in ("inside-warm-band", "faster-than-band", "cold-attributable",
                 "fingerprint-changed", "no-yardstick", "UNEXPLAINED"):
        rows = classes[name]
        print(f"  {name}: {len(rows)}")
        if name in ("faster-than-band", "cold-attributable",
                    "fingerprint-changed", "no-yardstick", "UNEXPLAINED"):
            for k, t, extra in rows:
                print(f"    {k}: driver {t:.2f}s  ({'expected~%.2fs' % extra if isinstance(extra, float) else extra})")
    if fp_moves:
        print("  fingerprint moves vs BASELINE.md (plan changes — re-justify each):")
        for k, got, exp in fp_moves:
            exps = " or ".join(f"{r:.2f}/{w:.2f}" for r, w in exp)
            print(f"    {k}: got {got[0]:.2f}/{got[1]:.2f} MB  expected {exps} MB")
    else:
        print("  fingerprints: all keys with expectations match BASELINE.md")
    sys.exit(1 if classes["UNEXPLAINED"] else 0)


if __name__ == "__main__":
    main()
