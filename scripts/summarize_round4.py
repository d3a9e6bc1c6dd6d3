#!/usr/bin/env python
"""Aggregate the round-4 study artifacts (mode_study.json,
mode_attribution.json, texture_study.json, factorial_study.json under a
batch output dir) into one summary JSON + a readable table — the source
for docs/TRAINING_EVIDENCE.md's round-4 sections.

Usage: python scripts/summarize_round4.py /tmp/studies_r4 [-o out.json]
"""

import argparse
import glob
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", nargs="?", default="/tmp/studies_r4")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    summary = {"mode_arms": [], "texture_arms": []}
    for path in sorted(glob.glob(
            os.path.join(args.root, "modestudy", "*", "mode_study.json"))):
        arm_dir = os.path.dirname(path)
        with open(path) as f:
            study = json.load(f)
        row = {
            "arm": os.path.basename(arm_dir),
            "variant": study["variant"],
            "seed": study.get("seed", 0),
            "iterations": study["iterations"],
            "val_mel": study.get("final_validation", {}).get(
                "Validation mel loss"),
            "frac_hi": study["generated"]["frac_hi"],
            "frac_near_mode": study["generated"]["frac_near_mode"],
            "mean_commitment": study["generated"]["mean_commitment"],
            "device": study.get("device"),
        }
        attr_path = os.path.join(arm_dir, "mode_attribution.json")
        if os.path.exists(attr_path):
            with open(attr_path) as f:
                attr = json.load(f)
            row.update({
                "within_noise_consistency": attr["within_noise_consistency"],
                "consistency_chance_floor": attr["consistency_chance_floor"],
                "styles_majority_hi": attr["styles_majority_hi"],
                "styles_majority_lo": attr["styles_majority_lo"],
                "per_style_chi2_p": attr["per_style_chi2_p"],
                "grid": f'{attr["n_styles"]}x{attr["n_dropout"]}',
            })
        summary["mode_arms"].append(row)

    for path in sorted(glob.glob(
            os.path.join(args.root, "texstudy", "*", "texture_study.json"))):
        with open(path) as f:
            study = json.load(f)
        summary["texture_arms"].append({
            "arm": os.path.basename(os.path.dirname(path)),
            "variant": study["variant"],
            "seed": study.get("seed", 0),
            "iterations": study["iterations"],
            "val_mel": study.get("final_validation", {}).get(
                "Validation mel loss"),
            "real_temporal_std": study["real"]["temporal_std"],
            "gen_temporal_std": study["generated"]["temporal_std"],
            "texture_recovery": study["texture_recovery"],
            "device": study.get("device"),
        })

    summary["factorial_arms"] = []
    for path in sorted(glob.glob(
            os.path.join(args.root, "*", "factorial_study.json"))):
        with open(path) as f:
            study = json.load(f)
        joint = study["attribution_joint"]
        row = {
            "arm": os.path.basename(os.path.dirname(path)),
            "variant": study["variant"],
            "seed": study.get("seed", 0),
            "iterations": study["iterations"],
            "val_mel": study.get("final_validation", {}).get(
                "Validation mel loss"),
            "chi2_a": study["attribution_a"]["per_style_chi2"],
            "chi2_a_p": study["attribution_a"]["per_style_chi2_p"],
            "chi2_b": study["attribution_b"]["per_style_chi2"],
            "chi2_b_p": study["attribution_b"]["per_style_chi2_p"],
            "joint_chi2": joint["per_style_chi2"],
            "joint_chi2_p": joint["per_style_chi2_p"],
            "joint_consistency": joint["within_noise_consistency"],
            "joint_chance_floor": joint["consistency_chance_floor"],
            "modes_present": joint["modes_present"],
            "device": study.get("device"),
        }
        if study.get("coverage"):
            row.update({
                "coverage": study["coverage"]["coverage"],
                "cell_consistency": study["coverage"]["cell_consistency"],
            })
        if study.get("binding"):
            row.update({
                "bands_bound": study["binding"]["bands_bound"],
                "modularity": study["binding"]["modularity"],
                "assignment": study["binding"]["assignment"],
            })
        summary["factorial_arms"].append(row)

    out = args.output or os.path.join(args.root, "round4_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
