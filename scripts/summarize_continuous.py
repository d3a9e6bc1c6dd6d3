#!/usr/bin/env python
"""Tabulate continuous-control study artifacts (continuous_study.json
under a batch output dir) into one summary JSON + a readable table — the
source for docs/TRAINING_EVIDENCE.md's continuous-knob section.

Usage: python scripts/summarize_continuous.py /tmp/contstudy [-o out.json]
"""

import argparse
import glob
import json
import os


COLS = ("arm", "seed", "iters", "val_mel", "sweep_rho", "sweep_p",
        "mono", "range_cov", "ctl_ratio", "attr_rho", "attr_p")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", nargs="?", default="/tmp/contstudy")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    rows = []
    for path in sorted(glob.glob(
            os.path.join(args.root, "*", "continuous_study.json"))):
        with open(path) as f:
            s = json.load(f)
        c, a = s["control"], s["attribution"]
        rows.append({
            "arm": s["variant"],
            "seed": s.get("seed", 0),
            "iters": s["iterations"],
            "val_mel": round(s.get("final_validation", {}).get(
                "Validation mel loss", float("nan")), 3),
            "sweep_rho": c["spearman"],
            "sweep_p": c["perm_p"],
            "mono": c["monotonicity"],
            "range_cov": c["range_coverage"],
            "ctl_ratio": c["control_ratio"],
            "attr_rho": a["spearman"],
            "attr_p": a["perm_p"],
            "real_rho": s["real_curve"]["spearman"],
            "device": s.get("device"),
        })
    rows.sort(key=lambda r: (r["arm"], r["seed"]))

    widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) if rows
              else len(c) for c in COLS}
    print("  ".join(c.ljust(widths[c]) for c in COLS))
    for r in rows:
        print("  ".join(str(r[c]).ljust(widths[c]) for c in COLS))

    if args.output:
        with open(args.output, "w") as f:
            json.dump({"arms": rows}, f, indent=2)
        print(f"\nwrote {args.output}")


if __name__ == "__main__":
    main()
