"""Consolidate the round-4 policy-arm campaign into one matrix.

Reads artifacts/r4/ (the tracked exports every chip queue lands as it
finishes — summaries, eval logs, robustness sweeps) and emits a single
markdown table: one row per trained policy arm, columns for clean /
zero-shot / held-out-procedural success and the structural-dropout
robustness point that separates the recipes (BENCH.md round 4:
patch_occlusion=0.25 is where layout-DR collapses and demo-guided or
fault-augmented training holds).

Run anytime (CPU-only, no chip):
    python tools/r4_report.py [--dir artifacts/r4] [--out artifacts/r4/ARMS.md]
"""

import argparse
import json
import re
from pathlib import Path

# arm -> short recipe description (training world / assignment / extras)
RECIPES = {
    "dr_rand8": "rand8, lane-pinned, amax=2.0",
    "dr_rand8b": "rand8, lane-pinned (re-run of dr_rand8)",
    "dr_rand4": "rand4, lane-pinned",
    "dr_rand16": "rand16, lane-pinned",
    "dr_rand32": "rand32, lane-pinned (inert beyond K=16: lane%K)",
    "drr_rand8": "rand8, per-reset resample (collapsed: alpha 0.003)",
    "drr_rand32": "rand32, per-reset resample",
    "drr_rand8_amin": "rand8, per-reset + alpha_min=0.1 (queue H A/B)",
    "drr_rand8_aminb": "rand8, per-reset + alpha_min=0.1 (chip-grade re-run)",
    "aug_rand8": "rand8, lane-pinned + fault aug patch=0.25/noise=0.196@p0.5",
    "aug_rand8_amin": "fault aug (as aug_rand8) + alpha_min=0.1",
    "drq_rand8": "rand8, lane-pinned + DrQ shift=4 (sac.aug_shift)",
    "drq_rand8_amin": "DrQ shift=4 + alpha_min=0.1",
    "dr_randh32": "randh32: 32 hospital-sized arenas, per-reset",
    "dr_randm32": "randm32: 16 RRC- + 16 hospital-sized, per-reset",
}


def read_summary(d: Path, arm: str):
    p = d / f"{arm}_summary.json"
    return json.loads(p.read_text()) if p.exists() else None


def read_eval_log(d: Path, arm: str, world: str):
    """'success rate: 47.0% (47 goals), collisions: 53' -> (0.47, 53).

    Falls back to a `_cpu25` provisional log (25 episodes on CPU, taken
    while the chip was busy training) — those render with a * marker."""
    p = d / f"{arm}_{world}_eval.log"
    if not p.exists():
        # queue scripts before r4l named the rrc eval '<arm>_rrc_eval.log'
        p = d / f"{arm}_rrc_eval.log" if world == "rrc" else p
    provisional = False
    if not p.exists():
        p = d / f"{arm}_{world}_eval_cpu25.log"
        provisional = True
    if not p.exists():
        return None
    m = None
    for line in p.read_text().splitlines():
        m = re.search(r"success rate:\s*([\d.]+)%.*collisions:\s*(\d+)",
                      line) or m
    if not m:
        return None
    return (float(m.group(1)) / 100.0, int(m.group(2)), provisional)


def read_robustness_point(d: Path, arm: str, world: str, **knobs):
    """The (world, knobs) row of the arm's robustness sweep, if swept."""
    for stem in (f"robustness_{arm}", f"robustness_{arm.replace('dr_', '')}"):
        p = d / f"{stem}.jsonl"
        if not p.exists():
            continue
        for line in p.read_text().splitlines():
            r = json.loads(line)
            if r.get("world") != world:
                continue
            active = {k: v for k, v in r.items()
                      if k in ("obs_noise", "blur", "occlusion",
                               "patch_occlusion", "greying") and v}
            if active == knobs:
                return r["success_rate"]
    return None


def fmt(v, pct=True):
    if v is None:
        return "—"
    if isinstance(v, tuple):
        star = "\\*" if len(v) > 2 and v[2] else ""
        return f"{v[0] * 100:.0f}%{star}"
    return f"{v * 100:.0f}%" if pct else str(v)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="artifacts/r4")
    ap.add_argument("--out", default="artifacts/r4/ARMS.md")
    args = ap.parse_args(argv)
    d = Path(args.dir)

    rows = []
    for arm, recipe in RECIPES.items():
        s = read_summary(d, arm)
        if s is None:
            continue
        hospital = (s["eval_success_rate"]
                    if s.get("eval_world") == "hospital" else None)
        rows.append({
            "arm": arm, "recipe": recipe,
            "dead": s.get("aborted_dead", False),
            "train": f"{s.get('train_successes', '?')}/"
                     f"{s.get('train_episodes', '?')}",
            "rrc": read_eval_log(d, arm, "rrc"),
            "hospital": hospital,
            "rand100": read_eval_log(d, arm, "rand100"),
            "randm100": read_eval_log(d, arm, "randm100"),
            "patch_rrc": read_robustness_point(d, arm, "rrc",
                                               patch_occlusion=0.25),
            "patch_hosp": read_robustness_point(d, arm, "hospital",
                                                patch_occlusion=0.25),
        })

    lines = [
        "# Round-4 policy arms — one matrix",
        "",
        "All evals 100 deterministic episodes (testing.py protocol).",
        "RRC/hospital are zero-shot for every rand* arm; rand100/randm100",
        "are held-out PROCEDURAL ensembles (eval seed differs from",
        "training, every layout never-seen). patch=0.25 is the",
        "structural-dropout robustness point (one random rectangle over",
        "25% of the frame). \\* = provisional: 25 episodes on CPU, taken",
        "while the chip was training (chip re-run pending).",
        "",
        "| arm | recipe | train goals | RRC | hospital | rand100 "
        "| randm100 | patch.25 RRC | patch.25 hosp |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        dead = " **DEAD**" if r["dead"] else ""
        lines.append(
            f"| {r['arm']}{dead} | {r['recipe']} | {r['train']} "
            f"| {fmt(r['rrc'])} | {fmt(r['hospital'])} "
            f"| {fmt(r['rand100'])} | {fmt(r['randm100'])} "
            f"| {fmt(r['patch_rrc'])} | {fmt(r['patch_hosp'])} |")
    # reference rows: the non-DR flagship recipes, for scale (held-out
    # columns fill in once tools/r4n_heldout_flagships.sh has run)
    lines += [
        f"| rrc specialist (r3) | RRC only, from scratch | 734/804 | "
        f"100% (seen) | 0% | {fmt(read_eval_log(d, 'flag_spec', 'rand100'))} "
        f"| {fmt(read_eval_log(d, 'flag_spec', 'randm100'))} | 0% | — |",
        f"| gw10 generalist (r3) | BC warm start + gw=10 guided, RRC arena "
        f"| — | 62-78% | 48-69% "
        f"| {fmt(read_eval_log(d, 'flag_gw10', 'rand100'))} "
        f"| {fmt(read_eval_log(d, 'flag_gw10', 'randm100'))} | 71% | 69% |",
    ]
    text = "\n".join(lines) + "\n"
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
