#!/usr/bin/env python3
"""Fit per-gate scaling exponents across the built-in 100x SF span.

Reads three Bench artifact files (SPARK_GRAFT_BENCH_OUT format: the
bench_detail line carries full per-gate median/cold maps) produced at
sf0.001 / sf0.01 / sf0.1 and writes SCALING_r{N}.json plus a markdown
summary table:

  python3 tools/scaling_fit.py SCALING_r12 bench_sf0.001.txt \
      bench_sf0.01.txt bench_sf0.1.txt

Per gate it reports:
  - median seconds at each SF
  - exp_fit: least-squares slope of log(median) vs log(sf) over all
    three points (understates growth when the small-SF points sit on
    fixed session overhead, so it is advisory)
  - exp_top: the top-leg exponent log10(t(0.1) / t(0.01)) — the signal
    that matters (both points are big enough to clear fixed overhead)
  - flagged: exp_top > 1.3 AND t(0.1) > 0.5 s (below half a second the
    "growth" is scheduler/barrier noise, not a plan property)

This is an offline artifact tool (driver-side python, like
check_oracle.py) — it is not part of the shipped library.
"""
import json
import math
import sys


def detail_line(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "bench_detail":
                return d
    raise SystemExit(f"no bench_detail line in {path}")


def slope(xs, ys):
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den


def main():
    if len(sys.argv) != 5:
        raise SystemExit(__doc__)
    out_base, paths = sys.argv[1], sys.argv[2:]
    sfs = [0.001, 0.01, 0.1]
    details = [detail_line(p) for p in paths]
    gates = sorted(set(details[0]["median"]) & set(details[1]["median"])
                   & set(details[2]["median"]))
    rows = []
    for g in gates:
        ts = [d["median"][g] for d in details]
        if min(ts) <= 0:
            continue
        exp_fit = slope([math.log(s) for s in sfs], [math.log(t) for t in ts])
        exp_top = math.log(ts[2] / ts[1]) / math.log(10)
        rows.append({
            "gate": g,
            "t_sf0001": round(ts[0], 3),
            "t_sf001": round(ts[1], 3),
            "t_sf01": round(ts[2], 3),
            "exp_fit": round(exp_fit, 3),
            "exp_top": round(exp_top, 3),
            "flagged": exp_top > 1.3 and ts[2] > 0.5,
        })
    rows.sort(key=lambda r: -r["exp_top"])
    flagged = [r for r in rows if r["flagged"]]
    legs = [{"sf": s, "reps": d.get("reps"),
             "load_start": d.get("load_start"), "load_end": d.get("load_end")}
            for s, d in zip(sfs, details)]
    summary = {
        "sfs": sfs,
        "legs": legs,
        "n_gates": len(rows),
        "n_flagged": len(flagged),
        "flagged": [r["gate"] for r in flagged],
        "gates": rows,
    }
    with open(out_base + ".json", "w") as f:
        json.dump(summary, f, indent=1)
    with open(out_base + ".md", "w") as f:
        f.write("# Per-gate scaling exponents (sf0.001 / sf0.01 / sf0.1)\n\n")
        f.write(f"{len(rows)} gates fitted; {len(flagged)} flagged "
                "(top-leg exponent > 1.3 and t(sf0.1) > 0.5 s).\n\n")
        f.write("Legs: " + "; ".join(
            f"sf{l['sf']}: reps={l['reps']} load={l['load_start']}->"
            f"{l['load_end']}" for l in legs) + "\n\n")
        f.write("| gate | t(0.001) | t(0.01) | t(0.1) | exp_fit | exp_top | flag |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['gate']} | {r['t_sf0001']} | {r['t_sf001']} | "
                    f"{r['t_sf01']} | {r['exp_fit']} | {r['exp_top']} | "
                    f"{'FLAG' if r['flagged'] else ''} |\n")
    print(f"{len(rows)} gates -> {out_base}.json/.md; flagged: "
          f"{[r['gate'] for r in flagged]}")


if __name__ == "__main__":
    main()
