"""Long-soak convergence on the FROZEN eval protocol (VERDICT r1 #7/#8).

Trains presets for many steps, evaluating on the frozen 512-scene suite
at a fixed cadence, so the quality-vs-steps curve is honest and
comparable round-to-round (round 1's 50k numbers used freshly sampled
eval batches).

    python benchmarks/convergence_fixed.py [steps] [eval_every] [presets...]

Writes benchmarks/convergence_fixed_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(preset: str, steps: int, eval_every: int, overrides: dict) -> dict:
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk
    from ndivplanning_tpu.utils.config import get_config

    # The schedule horizon must match the soak budget: decaying
    # lr_schedules land on lr_final_ratio (default 0) at cfg.steps, and
    # the preset default is 10k — a 100k cosine soak that forgets to
    # override `steps` trains with LR=0 past 10k and flatlines (this
    # burned a 3-seed transformer soak).  Explicit overrides still win.
    cfg = get_config(preset, dp_shards=1, div_shards=1,
                     **{"steps": steps, **overrides})
    state = create_train_state(cfg)
    curve = []
    done = 0
    t0 = time.monotonic()
    # Cap the per-dispatch scan length: a single device execution that
    # runs much past ~1 minute crashes the axon TPU worker ("TPU worker
    # process crashed or restarted") — measured: imagecond 5000-step
    # chunks at ~35 s survive, transformer-G 5000-step chunks at ~75 s
    # (15 ms/step) died twice at the first post-chunk fetch.  Default
    # keeps the historical single-program behaviour; set
    # CONVERGENCE_CHUNK_CAP for slow-per-step models.
    cap = int(os.environ.get("CONVERGENCE_CHUNK_CAP", "0")) or eval_every
    while done < steps:
        boundary = min(done + eval_every, steps)
        while done < boundary:
            n = min(cap, boundary - done)
            state, m = train_chunk(cfg, state, n)
            done += n
        ev = {k: float(v) for k, v in
              evaluate_fixed(cfg, state, n_scenes=512).items()}
        if cfg.g_ema_decay > 0:
            # Best-of-both protocol (train/loop.py _best_candidates):
            # the raw generator's peak can beat the smoother EMA curve.
            ev["raw_eval_success_rate"] = float(evaluate_fixed(
                cfg, state, n_scenes=512,
                use_ema=False)["eval_success_rate"])
        row = {"step": done,
               **{k: float(v[-1]) for k, v in m.items()}, **ev}
        curve.append(row)
        print(json.dumps({"preset": preset, "step": done,
                          "success": round(ev["eval_success_rate"], 4),
                          "raw_success": round(
                              ev.get("raw_eval_success_rate",
                                     ev["eval_success_rate"]), 4),
                          "collision": round(ev["eval_collision_rate"], 4),
                          "diversity": round(
                              ev["eval_mean_pairwise_dist"], 4)}),
              flush=True)
    wall = time.monotonic() - t0

    def _best_of_both(r):
        return max(r["eval_success_rate"],
                   r.get("raw_eval_success_rate", 0.0))

    best = max(curve, key=_best_of_both)
    return {"preset": preset, "overrides": {k: str(v) for k, v in
                                            overrides.items()},
            "steps": steps, "wall_s": round(wall, 1),
            "final": curve[-1], "best": best, "curve": curve}


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    eval_every = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    presets = sys.argv[3:] or ["goalcond", "imagecond"]
    results = []
    path = os.environ.get("CONVERGENCE_OUT") or os.path.join(
        os.path.dirname(__file__), "convergence_fixed_results.json")
    for p in presets:
        name, _, ov = p.partition(":")
        overrides = json.loads(ov) if ov else {}
        results.append(run(name, steps, eval_every, overrides))
        # Write after EVERY preset: a crash (or a TPU-worker restart) on
        # seed N must not lose seeds 0..N-1 — that already happened once.
        with open(path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
