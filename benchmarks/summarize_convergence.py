"""Summarize convergence-soak JSONs into the canonical recipe table.

    python benchmarks/summarize_convergence.py [files...]

With no arguments, summarizes every ``convergence_*.json`` in this
directory.  For each run: best-of-both peak (max over the raw and EMA
eval legs per point — the protocol every BASELINE.md quality row uses),
the step and diversity (mean pairwise distance) at the best checkpoint,
and the late-soak mean/floor (points at step >= late_start, default 2/3
of the horizon).  Per study: 3-seed mean of peaks.

Prints a markdown table (ready for BASELINE.md) and a JSON line per
study.  The quality bar is success AND diversity — a peak at collapsed
diversity (< 0.3) is flagged, per the round-3 NDiv scale-invariance
finding.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def best_of_both(point: dict) -> float:
    return max(point["eval_success_rate"],
               point.get("raw_eval_success_rate", 0.0))


def summarize_run(run: dict, late_start: int | None = None) -> dict:
    curve = run["curve"]
    horizon = run["steps"]
    late_from = late_start if late_start is not None else (2 * horizon) // 3
    peak = max(best_of_both(p) for p in curve)
    late = [best_of_both(p) for p in curve if p["step"] >= late_from]
    best = run["best"]
    return {
        "seed": run.get("overrides", {}).get("seed"),
        "peak": round(peak, 3),
        "best_step": best["step"],
        "div_at_best": round(best["eval_mean_pairwise_dist"], 3),
        "late_mean": round(sum(late) / len(late), 3) if late else None,
        "late_floor": round(min(late), 3) if late else None,
        "wall_s": run.get("wall_s"),
    }


def summarize_file(path: str, late_start: int | None = None) -> dict:
    with open(path) as f:
        runs = json.load(f)
    rows = [summarize_run(r, late_start) for r in runs]
    peaks = [r["peak"] for r in rows]
    divs = [r["div_at_best"] for r in rows]
    lates = [r["late_mean"] for r in rows if r["late_mean"] is not None]
    return {
        "study": os.path.basename(path).removeprefix("convergence_")
                                       .removesuffix(".json"),
        "n_seeds": len(rows),
        "peaks": peaks,
        "peak_mean": round(sum(peaks) / len(peaks), 3),
        "div_at_best": divs,
        "late_mean": round(sum(lates) / len(lates), 3) if lates else None,
        "collapsed": any(d < 0.3 for d in divs),
        "runs": rows,
    }


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sys.argv[1:] or sorted(glob.glob(
        os.path.join(here, "convergence_*.json")))
    print("| study | peaks (per seed) | mean | div at best | late mean |")
    print("|---|---|---|---|---|")
    summaries = []
    for p in paths:
        try:
            s = summarize_file(p)
        except (json.JSONDecodeError, KeyError, ValueError,
                ZeroDivisionError, TypeError) as e:
            # A degenerate file (empty run list / empty curve / schema
            # drift) skips THAT study, never the whole summary.
            print(f"[skip] {p}: {e}", file=sys.stderr)
            continue
        summaries.append(s)
        flag = " ⚠ collapsed" if s["collapsed"] else ""
        print(f"| {s['study']} | "
              f"{' / '.join(f'{x:.3f}' for x in s['peaks'])} | "
              f"{s['peak_mean']:.3f} | "
              f"{'-'.join(f'{d:.2f}' for d in sorted(s['div_at_best']))}"
              f"{flag} | {s['late_mean']} |")
    for s in summaries:
        print(json.dumps(s))


if __name__ == "__main__":
    main()
