"""Expert iteration: distill the closed-loop planner back into G.

    python examples/expert_iteration.py [workdir]

Trains a small goal-conditioned model, then runs one record -> fine-tune
-> frozen-suite-eval round (train/distill.py): the MPC planner's
successes — re-verified OPEN-LOOP against their true scenes — become
expert data for a GAN fine-tune, and the round is kept only if frozen-
suite quality improves WITHOUT collapsing diversity (the
min_diversity_frac guard).  Small sizes so it finishes in a few minutes
on CPU; scale scenes_per_round/rounds up for real studies (the r4
chip studies use 2048-4096 scenes, per_scene 4-8).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndivplanning_tpu.train.distill import expert_iteration
from ndivplanning_tpu.train.loop import train
from ndivplanning_tpu.utils.config import get_config


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ndiv_distill_demo"
    cfg = get_config(
        "goalcond",
        workdir=workdir,
        steps=800,
        batch_size=64,
        g_hidden=(128, 128),
        d_hidden=(128, 128),
        eval_every=400,
        log_every=200,
    )

    # 1. A base generator (resumes if the workdir has a checkpoint).
    state, _ = train(cfg)

    # 2. One expert-iteration round: record MPC successes (per_scene=2
    #    diverse draws per condition), fine-tune, adjudicate on the
    #    frozen suite with the diversity guard.
    state, report = expert_iteration(
        cfg, state,
        rounds=1,
        scenes_per_round=128,
        per_scene=2,
        n_candidates=64,
        replan_every=8,
        suite_scenes=64,
        workdir=os.path.join(workdir, "distill"),
        min_diversity_frac=0.5,
    )
    row = report[0]
    print(json.dumps({
        "kept_experts": row["record"]["kept"],
        "open_loop_keep_rate": row["record"]["open_loop_keep_rate"],
        "before_success": row["before"]["eval_success_rate"],
        "after_success": row.get("after", {}).get("eval_success_rate"),
        "accepted": row["accepted"],
        "rejected_for_diversity": row.get("rejected_for_diversity"),
    }, indent=1))


if __name__ == "__main__":
    main()
