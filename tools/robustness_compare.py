"""Merge robustness sweeps into one fault x policy comparison matrix.

tools/robustness_sweep.py emits one sweep.jsonl per (policy, worlds) run;
the cross-policy tables in BENCH.md (round 4) were assembled by hand. This
tool rebuilds them reproducibly:

    python tools/robustness_compare.py \
        spec=artifacts/r4/robustness_spec.jsonl \
        gw10=artifacts/r4/robustness_gw10.jsonl \
        rand8=artifacts/r4/robustness_rand8.jsonl \
        [--world rrc] [--out results/robustness_compare.md]

Each positional arg is LABEL=path; columns appear per (label, world) pair
found in the files (or only --world when given). Rows are the union of
fault points, "clean" first, then by knob name/magnitude. Cells show
"SS% (C)" — success rate and collision count over the sweep's episodes.
"""

from __future__ import annotations

import argparse
import json
import sys

KNOBS = ("obs_noise", "blur", "occlusion", "patch_occlusion", "greying")


def _point(row: dict):
    """Fault identity of a sweep row: the (knob, value) pairs that are on.
    The sweep protocol perturbs one knob per point; compound points would
    render as comma-joined labels."""
    on = tuple((k, round(float(row.get(k, 0.0)), 6))
               for k in KNOBS if float(row.get(k, 0.0)) > 0.0)
    return on


def _label(point) -> str:
    if not point:
        return "clean"
    return ",".join(f"{k}={v:g}" for k, v in point)


def load_sweeps(specs, world_filter=None):
    """[(label, path)] -> (ordered fault points, {(label, world): {point:
    row}})."""
    cols = {}
    points = []
    for label, path in specs:
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                row = json.loads(line)
                w = row.get("world", "?")
                if world_filter and w != world_filter:
                    continue
                pt = _point(row)
                if pt not in points:
                    points.append(pt)
                cols.setdefault((label, w), {})[pt] = row
    # clean first, then knob-name/value order (stable across files)
    points.sort(key=lambda pt: (len(pt) > 0,
                                [(KNOBS.index(k), v) for k, v in pt]))
    return points, cols


def render_markdown(points, cols) -> str:
    keys = list(cols)
    head = "| fault | " + " | ".join(
        f"{lbl}, {w}" for lbl, w in keys) + " |"
    sep = "|---|" + "---|" * len(keys)
    lines = [head, sep]
    for pt in points:
        cells = []
        for key in keys:
            row = cols[key].get(pt)
            if row is None:
                cells.append("—")
            else:
                cells.append(f"{100 * float(row['success_rate']):.0f}% "
                             f"({int(row['collisions'])})")
        lines.append(f"| {_label(pt)} | " + " | ".join(cells) + " |")
    return "\n".join(lines) + "\n"


def main(argv=None):
    p = argparse.ArgumentParser(
        description="merge robustness sweep.jsonl files into one "
                    "fault x policy markdown matrix")
    p.add_argument("sweeps", nargs="+", metavar="LABEL=PATH")
    p.add_argument("--world", default=None,
                   help="only this world's rows (default: a column per "
                        "(label, world) pair found)")
    p.add_argument("--out", default=None,
                   help="also write the table to this file")
    args = p.parse_args(argv)

    specs = []
    for s in args.sweeps:
        label, sep, path = s.partition("=")
        if not sep or not path:
            p.error(f"expected LABEL=PATH, got {s!r}")
        specs.append((label, path))

    points, cols = load_sweeps(specs, world_filter=args.world)
    if not cols:
        p.error("no matching rows (wrong --world, or empty files?)")
    table = render_markdown(points, cols)
    sys.stdout.write(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table)


if __name__ == "__main__":
    main()
