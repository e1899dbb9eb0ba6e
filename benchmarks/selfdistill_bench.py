"""Self-distillation as the twelfth stabiliser avenue (round 5).

Eleven avenues attacked the imagecond late-soak collapse inside the
adversarial game (R1, instance noise, slow-D, ndiv-weight, DiffAugment,
SN, top-k, LeCam, ADA, D warm-restarts, late-start restarts); none
reached the late-mean >=0.5 target — best-of-both checkpointing captures
a peak from a process that degrades.  This study leaves the game
instead: use the frozen best-of-both planning512 checkpoint (the 0.833
serving model) as its OWN teacher — record its open-loop-VERIFIED
successful one-shot draws (train/distill.py::record_planner_dataset with
planner="oneshot"), then train FRESH students on that fixed dataset and
measure their late-soak stability on the frozen 512-suite.

Why the planning512 expert-iteration negative (BASELINE.md r4) does not
predict this: there the teacher supervised the SAME near-frontier
student mid-game (no skill gap); here the skill gap is best-checkpoint
vs a fresh (or late-collapsed) student, and the student never faces the
live sampler's adversarial drift — D only ever sees the fixed verified
corpus.  Outcome either way closes the question: a student whose late
mean holds >=0.5 sidesteps the collapse by leaving the adversarial game;
a student that still collapses finally justifies "best-of-both is not a
workaround, it is the answer".

Usage: python benchmarks/selfdistill_bench.py [steps] [seed ...]
Env: SELFDISTILL_OUT (default benchmarks/selfdistill_imagecond.json),
     SELFDISTILL_WORKDIR (scratch root, default /tmp/r5/selfdistill),
     SELFDISTILL_SCENES / _PER_SCENE (recording volume, 8192 x 4).
Resume-safe: the recording is reused if its echo matches; each student
soak resumes from its own workdir checkpoints (train_from_dataset
restore=True).
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_teacher():
    """The planning512 best checkpoint + its recorded config — exactly
    the CLI's loading path (config.json base, <workdir>/best preferred)."""
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    workdir = os.path.join(REPO, "checkpoints", "planning512")
    cfg = load_config(workdir)
    if cfg is None:
        raise RuntimeError(f"no config.json under {workdir}")
    state = create_train_state(cfg)
    best = ckpt.restore_latest(os.path.join(workdir, "best"), state)
    state = best if best is not None else (
        ckpt.restore_latest(workdir, state) or state)
    return cfg, state


def _record(cfg, state, scratch: str, n_scenes: int, per_scene: int) -> dict:
    from ndivplanning_tpu.train.distill import record_planner_dataset

    npz = os.path.join(scratch, "teacher_oneshot.npz")
    rec_path = npz + ".json"
    want = {"planner": "oneshot", "n_scenes": n_scenes,
            "per_scene": per_scene}
    if os.path.exists(rec_path) and os.path.exists(npz):
        with open(rec_path, encoding="utf-8") as f:
            stats = json.load(f)
        if all(stats.get(k) == v for k, v in want.items()):
            return stats
    stats = record_planner_dataset(
        cfg, state, n_scenes, npz, planner="oneshot",
        per_scene=per_scene, n_candidates=cfg.n_candidates,
        scene_chunk=128)
    with open(rec_path, "w", encoding="utf-8") as f:
        json.dump(stats, f)
    return stats


def _summarise(workdir: str, steps: int) -> dict:
    """Eval-curve summary from a student's metrics.jsonl: peak, peak
    step, diversity at peak, late mean (>= 60% of the horizon) — the
    exact statistics the stabiliser ledger compares."""
    rows = []
    with open(os.path.join(workdir, "metrics.jsonl"), encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                r = json.loads(line)
                if "eval_success_rate" in r:
                    rows.append(r)
    succ = np.array([r["eval_success_rate"] for r in rows])
    step = np.array([r["step"] for r in rows])
    div = np.array([r.get("eval_mean_pairwise_dist", np.nan) for r in rows])
    i_best = int(np.argmax(succ))
    late = step >= 0.6 * steps
    return {
        "peak": float(succ[i_best]),
        "peak_step": int(step[i_best]),
        "div_at_peak": float(div[i_best]),
        "late_mean": float(succ[late].mean()) if late.any() else None,
        "late_min": float(succ[late].min()) if late.any() else None,
        "late_div_mean": float(np.nanmean(div[late])) if late.any() else None,
        "final": float(succ[-1]),
        "n_evals": len(rows),
    }


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    seeds = [int(s) for s in sys.argv[2:]] or [0, 1, 2]
    scratch = os.environ.get("SELFDISTILL_WORKDIR", "/tmp/r5/selfdistill")
    n_scenes = int(os.environ.get("SELFDISTILL_SCENES", "8192"))
    per_scene = int(os.environ.get("SELFDISTILL_PER_SCENE", "4"))
    out_path = os.environ.get(
        "SELFDISTILL_OUT",
        os.path.join(REPO, "benchmarks", "selfdistill_imagecond.json"))
    os.makedirs(scratch, exist_ok=True)

    import jax  # noqa: F401  (backend init after env is settled)

    from ndivplanning_tpu.data.host_pipeline import ArrayDataset
    from ndivplanning_tpu.train.loop import train_from_dataset
    from ndivplanning_tpu.train.state import create_train_state

    cfg_t, teacher = _load_teacher()
    stats = _record(cfg_t, teacher, scratch, n_scenes, per_scene)
    print(json.dumps({"record": stats}), flush=True)
    ds = ArrayDataset.from_npz(os.path.join(scratch, "teacher_oneshot.npz"))

    per_seed = {}
    for seed in seeds:
        # FRESH student, production recipe (cosine + half-LR — the
        # measured best healthy-diversity recipe on the b512
        # image-conditioned configs) with the decay horizon pinned to
        # THIS soak's budget (the round-3 steps-horizon lesson).
        cadence = min(5000, max(steps // 20, 1))
        cfg_s = cfg_t.replace(
            seed=seed, steps=steps, lr_schedule="cosine", g_lr=5e-4,
            eval_every=cadence, log_every=cadence,
            checkpoint_every=max(steps // 4, 1), workdir="")
        if ds.size < cfg_s.batch_size:  # tiny probes / heavy filtering
            cfg_s = cfg_s.replace(batch_size=ds.size)
        steps_per_epoch = max(ds.size // cfg_s.batch_size, 1)
        n_epochs = -(-steps // steps_per_epoch)
        wd = os.path.join(scratch, f"student_s{seed}")
        state = create_train_state(cfg_s)
        train_from_dataset(cfg_s, ds, num_epochs=n_epochs, state=state,
                           workdir=wd, restore=True, echo=False,
                           eval_suite=True)
        per_seed[str(seed)] = _summarise(wd, steps)
        print(json.dumps({("seed_%d" % seed): per_seed[str(seed)]}),
              flush=True)

    result = {
        "teacher": "checkpoints/planning512 best (0.833 frozen-suite)",
        "record": stats,
        "dataset_rows": int(ds.size),
        "steps": steps,
        "per_seed": per_seed,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
