"""Round-5 campaign report: one arms matrix + ONE cross-arm robustness grid.

Extends tools/r4_report.py (which stays the round-4 snapshot generator):
reads BOTH artifacts/r4 and artifacts/r5, adds the round-5 arms (DrQ
diagnosis trio, mixed-scale DR, teacher distillation, seed replicates),
and emits the cross-arm fault table the round-4 VERDICT asked for
(arm x patch_occlusion=0.25 / obs_noise=0.5, next to each arm's clean
score on the same world — BENCH.md round 5: patch.25 alone is degenerate
for DR arms).

Run anytime (CPU-only, no chip):
    python tools/r5_report.py [--out artifacts/r5/ARMS.md]
"""

import argparse
import json
import re
from pathlib import Path

# arm -> (recipe description, artifact dir)
R4 = Path("artifacts/r4")
R5 = Path("artifacts/r5")

RECIPES = {
    # round-4 rows (chip-grade; r4_report.py renders the full r4 set)
    "dr_rand8": ("rand8, lane-pinned, amax=2.0", R4),
    "dr_rand8b": ("rand8 (deterministic re-run of dr_rand8)", R4),
    "drr_rand8_aminb": ("rand8, per-reset + alpha_min=0.1 (chip re-run)", R4),
    "drr_rand32": ("rand32, per-reset (r4; checkpoints lost)", R4),
    "aug_rand8_amin": ("fault aug patch=.25/noise=.196@p.5 + floor", R4),
    "drq_rand8_amin": ("DrQ shift=4 full-aug + floor", R4),
    # round-5 arms
    "drr_rand32b": ("rand32, per-reset (retrain of the 82% arm)", R5),
    "drr_rand32c": ("rand32, per-reset (3rd retrain; held-out rows + sweep)", R5),
    "drqc_rand8_amin": ("DrQ shift=4 CRITIC-ONLY (aug_actor=F) + floor", R5),
    "drq2_rand8_amin": ("DrQ shift=2 full-aug + floor", R5),
    "drqw_rand8_amin": ("DrQ shift=4 full-aug + 20k warmup + floor", R5),
    "dr_randm32": ("randm32: 16 RRC- + 16 hospital-scale, per-reset, no floor", R5),
    "dr_randm32_s11": ("dr_randm32 recipe, seed 11", R5),
    "dr_randm32_s11_amin": ("dr_randm32 recipe, seed 11 + alpha_min=0.1", R5),
    "dr_randh32": ("randh32: 32 hospital-scale arenas, per-reset, no floor", R5),
    "dr_rand8_s11": ("dr_rand8 recipe, seed 11", R5),
    "dr_rand8_s12": ("dr_rand8 recipe, seed 12", R5),
}

# generalization-harness arms: results live in a train.log whose last JSON
# line is {"rrc": ..., "hospital": ..., "sac_goals": ..., "recipe": ...}
GEN_ARMS = {
    "distill": ("gw10-teacher demos ON rand8 -> gw=10 guided on rand8", R5),
    "distill_m32": ("gw10-teacher demos x randm32 DR (gw=10 guided)", R5),
    "gw10_s11": ("gw10 recipe, seed 11", R5),
    "gw10_s12": ("gw10 recipe, seed 12", R5),
}


def read_summary(d: Path, arm: str):
    # the preferred dir first, then the other round's artifact dir (the
    # r4o queue copies its stages into artifacts/r4 even when they land
    # during round 5)
    for dd in (d, R4 if d == R5 else R5):
        p = dd / f"{arm}_summary.json"
        if p.exists():
            return json.loads(p.read_text())
    return None


def read_eval_log(arm: str, world: str):
    for d in (R5, R4):
        p = d / f"{arm}_{world}_eval.log"
        if p.exists():
            m = None
            for line in p.read_text().splitlines():
                m = re.search(
                    r"success rate:\s*([\d.]+)%.*collisions:\s*(\d+)",
                    line) or m
            if m:
                return float(m.group(1)) / 100.0, int(m.group(2))
    return None


def read_gen_log(d: Path, arm: str):
    p = d / f"{arm}_train.log"
    if not p.exists():
        p = Path("results") / arm / "train.log"
    if not p.exists():
        return None
    row = None
    for line in p.read_text().splitlines():
        line = line.strip()
        if line.startswith("{") and '"rrc"' in line:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                pass
    return row


def robustness_rows(arm: str):
    """{(world, knob, value): success_rate} from the arm's sweep jsonl."""
    out = {}
    for d in (R5, R4):
        p = d / f"robustness_{arm}.jsonl"
        if not p.exists():
            continue
        for line in p.read_text().splitlines():
            r = json.loads(line)
            active = [(k, v) for k, v in r.items()
                      if k in ("obs_noise", "blur", "occlusion",
                               "patch_occlusion", "greying") and v]
            if not active:
                out[(r["world"], "clean", 0.0)] = r["success_rate"]
            elif len(active) == 1:
                k, v = active[0]
                out[(r["world"], k, v)] = r["success_rate"]
        break
    return out


def fmt(v):
    if v is None:
        return "—"
    if isinstance(v, tuple):
        return f"{v[0] * 100:.0f}%"
    return f"{v * 100:.0f}%"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/r5/ARMS.md")
    args = ap.parse_args(argv)

    lines = [
        "# Round-5 policy arms + cross-arm robustness grid",
        "",
        "All evals 100 deterministic episodes (testing.py:103-144 "
        "protocol), chip-grade.",
        "RRC/hospital zero-shot for rand* arms; rand100/randm100 held-out",
        "procedural ensembles (eval seed stream disjoint from training).",
        "",
        "| arm | recipe | train goals | RRC | hospital | rand100 | randm100 |",
        "|---|---|---|---|---|---|---|",
    ]
    for arm, (recipe, d) in RECIPES.items():
        s = read_summary(d, arm)
        if s is None:
            continue
        dead = " **DEAD**" if s.get("aborted_dead") else ""
        hospital = (s["eval_success_rate"]
                    if s.get("eval_world") == "hospital" else None)
        lines.append(
            f"| {arm}{dead} | {recipe} "
            f"| {s.get('train_successes', '?')}/{s.get('train_episodes', '?')} "
            f"| {fmt(read_eval_log(arm, 'rrc'))} | {fmt(hospital)} "
            f"| {fmt(read_eval_log(arm, 'rand100'))} "
            f"| {fmt(read_eval_log(arm, 'randm100'))} |")
    for arm, (recipe, d) in GEN_ARMS.items():
        row = read_gen_log(d, arm)
        if row is None:
            continue
        lines.append(
            f"| {arm} | {recipe} | {row.get('sac_goals', '?')} "
            f"| {fmt(row.get('rrc'))} | {fmt(row.get('hospital'))} "
            f"| {fmt(read_eval_log(arm, 'rand100'))} "
            f"| {fmt(read_eval_log(arm, 'randm100'))} |")

    # ---- cross-arm robustness grid (VERDICT r4 #6) ----
    lines += [
        "",
        "## Cross-arm fault grid (100 eps/point; clean score of the SAME",
        "world beside each fault point — BENCH.md round 5: patch.25 alone",
        "is degenerate for DR arms)",
        "",
        "| arm | RRC clean | RRC patch.25 | RRC noise.5 | hosp clean "
        "| hosp patch.25 | hosp noise.5 |",
        "|---|---|---|---|---|---|---|",
    ]
    sweep_arms = (["gw10", "spec", "rand8", "rand16", "drr_rand8",
                   "aug_rand8", "drr_rand8_aminb", "aug_rand8_amin",
                   "drq_rand8_amin"]
                  + [a for a, (_, d) in RECIPES.items() if d == R5]
                  + list(GEN_ARMS))
    for arm in sweep_arms:
        rows = robustness_rows(arm)
        if not rows:
            continue
        cells = [rows.get(("rrc", "clean", 0.0)),
                 rows.get(("rrc", "patch_occlusion", 0.25)),
                 rows.get(("rrc", "obs_noise", 0.5)),
                 rows.get(("hospital", "clean", 0.0)),
                 rows.get(("hospital", "patch_occlusion", 0.25)),
                 rows.get(("hospital", "obs_noise", 0.5))]
        lines.append("| " + arm + " | "
                     + " | ".join(fmt(c) for c in cells) + " |")

    text = "\n".join(lines) + "\n"
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
