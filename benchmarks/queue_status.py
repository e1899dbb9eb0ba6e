"""Queue reconciliation ledger (VERDICT r4 #6).

Round 4 ended with three committed queue files representing work that
never ran — nothing in the tree flagged the phantom legs.  This tool
makes the committed tree honest about in-flight work: it scans the
chip-queue logs (the `[tag] <leg> attempt N` / `done` lines every
queue script emits) and writes a ran / didn't-run / where-it-stopped
ledger.  Run it when the round snapshot is cut:

    python benchmarks/queue_status.py /tmp/r4 /tmp/r5 > QUEUE_STATUS.md

Round 5 exposed the inverse failure: the machine was recycled mid-round
and /tmp evaporated, so legs that DID run (their artifacts are
committed) had no log evidence.  The ledger therefore also reconciles a
static leg → expected-artifact manifest against the tree: an artifact
on disk is proof a leg completed even when its log is gone, and a
missing artifact flags a leg as outstanding even when no log mentions
it.
"""

import os
import re
import sys

_LINE = re.compile(
    r"^\[(?P<tag>[\w-]+)\] (?P<rest>.+?)(?:\s+(?P<ts>\d\d:\d\d:\d\d))?$")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Leg → artifact manifest for the round-5 chip program (round5_queue.sh
# + round5b_queue.sh resume).  An artifact path is repo-relative; a leg
# with a committed artifact is DONE regardless of log survival.
MANIFEST = {
    ("r5", "serving_mp8"): ["benchmarks/serving_results_mp8.json"],
    ("r5", "distill_quad_ct_s3"): ["benchmarks/distill_quad_ct_s3.json"],
    ("r5b", "distill_unicycle_trajopt"):
        ["benchmarks/distill_unicycle_trajopt.json"],
    ("r5b", "distill_reacher_trajopt"):
        ["benchmarks/distill_reacher_trajopt.json"],
    ("r5b", "selfdistill"): ["benchmarks/selfdistill_imagecond.json"],
}
for _lr in ("0.0001", "0.00005"):
    for _s in range(3):
        MANIFEST[("r5b", f"tf_{_lr}_{_s}")] = [
            f"benchmarks/convergence_tf_lr{_lr}_s{_s}.json"]
# r5c (arm3 checkpoint program) and r5d (reacher distill retry after the
# r5b leg lost all three attempts to mid-recording worker flaps).
MANIFEST[("r5c", "arm3")] = [
    "benchmarks/arm3150k_eval.json",
    "benchmarks/arm3150k_mpc.json",
    "benchmarks/trajopt_results_arm3.json",
]
MANIFEST[("r5d", "distill_reacher_trajopt")] = [
    "benchmarks/distill_reacher_trajopt.json"]
# r5e: ADA at the half-LR recipe (VERDICT r4 weak #6), behind r5c.
MANIFEST[("r5e", "ada_halflr")] = [
    "benchmarks/convergence_ada_halflr.json"]
# r5f: second recycle resume (2026-08-20 ~21:51 UTC wiped /tmp again) —
# exactly the five legs the ledger showed MISSING, re-chained in one
# script (tf seed + ada_halflr + selfdistill inline; arm3/reacher via
# their original queue scripts, which report under r5c/r5d above).
MANIFEST[("r5f", "tf_0.00005_2")] = [
    "benchmarks/convergence_tf_lr0.00005_s2.json"]
MANIFEST[("r5f", "ada_halflr")] = [
    "benchmarks/convergence_ada_halflr.json"]
MANIFEST[("r5f", "selfdistill")] = [
    "benchmarks/selfdistill_imagecond.json"]


def scan(paths):
    legs = {}  # (tag, leg) -> {"attempts": n, "done": bool, "last": ts}
    order = []
    for root in paths:
        for name in sorted(os.listdir(root)):
            # Leg markers go to the queue scripts' own stderr logs
            # (roundNx_queue.log); leg stdout logs carry [metrics] lines
            # that are not queue state.
            if not (name.endswith(".log") and "queue" in name):
                continue
            with open(os.path.join(root, name), errors="replace") as f:
                for line in f:
                    m = _LINE.match(line.strip())
                    if not m:
                        continue
                    tag, rest, ts = m.group("tag", "rest", "ts")
                    parts = rest.split()
                    if (len(parts) < 2 or parts[0] == "chip"
                            or parts[1] not in ("attempt", "done")):
                        continue
                    leg = parts[0]
                    key = (tag, leg)
                    if key not in legs:
                        legs[key] = {"attempts": 0, "done": False,
                                     "failed": 0, "last": None}
                        order.append(key)
                    row = legs[key]
                    row["last"] = ts or row["last"]
                    if "attempt" in parts and "rc=" not in rest:
                        row["attempts"] += 1
                    if "rc=" in rest:
                        row["failed"] += 1
                    if parts[1:2] == ["done"]:
                        row["done"] = True
    return order, legs


def _artifact_state(key):
    paths = MANIFEST.get(key)
    if not paths:
        return "-"
    present = [os.path.exists(os.path.join(_REPO, p)) and
               os.path.getsize(os.path.join(_REPO, p)) > 0 for p in paths]
    if all(present):
        return "committed"
    if any(present):
        return "PARTIAL"
    return "MISSING"


def main():
    roots = [p for p in sys.argv[1:] if os.path.isdir(p)]
    order, legs = scan(roots)
    # Manifest legs with no surviving log still get a row: the artifact
    # is the evidence either way.
    for key in MANIFEST:
        if key not in legs:
            legs[key] = {"attempts": 0, "done": False, "failed": 0,
                         "last": None}
            order.append(key)
    print("# Queue status ledger\n")
    print("Generated by benchmarks/queue_status.py from the chip-queue "
          "logs under: " + (", ".join(roots) or "(none)") + "\n")
    print("| queue | leg | attempts | failed attempts | state | artifact "
          "| last seen (UTC) |")
    print("|---|---|---|---|---|---|---|")
    for tag, leg in order:
        row = legs[(tag, leg)]
        art = _artifact_state((tag, leg))
        if row["done"]:
            state = "DONE"
        elif art == "committed":
            state = "DONE (log lost, artifact present)"
        elif row["attempts"]:
            state = "IN FLIGHT / DIED MID-ATTEMPT"
        else:
            state = "never started"
        print(f"| {tag} | {leg} | {row['attempts']} | {row['failed']} "
              f"| {state} | {art} | {row['last'] or '-'} |")
    if not order:
        print("| - | - | - | - | no queue logs found | - | - |")


if __name__ == "__main__":
    main()
