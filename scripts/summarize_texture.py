#!/usr/bin/env python
"""Tabulate texture-study artifacts (*_texture.json under one or more
roots) into the recovery-vs-fidelity frontier table — the source for
docs/TRAINING_EVIDENCE.md's texture section.

Usage:
  python scripts/summarize_texture.py /tmp/texstudy /tmp/texstudy_gp3_rollout ...
"""

import argparse
import glob
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("roots", nargs="*", default=None)
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()
    roots = args.roots or sorted(glob.glob("/tmp/texstudy*"))

    rows = []
    for root in roots:
        # Run-dir layout (/tmp/texstudy*/<run>/texture_study.json) and the
        # committed flat layout (docs/evidence_r5/texture/<arm>_sN.json).
        paths = sorted(
            glob.glob(os.path.join(root, "*", "texture_study.json"))
            + glob.glob(os.path.join(root, "*", "*_texture.json"))
            + glob.glob(os.path.join(root, "*.json")))
        for path in paths:
            with open(path) as f:
                s = json.load(f)
            if "texture_recovery" not in s:
                continue
            hp = s.get("hparams", {})
            ov = s.get("hparams_override") or ""
            if "texstudy_" in root:
                arm = os.path.basename(root).replace("texstudy_", "")
            elif os.path.dirname(path).rstrip("/").endswith(root.rstrip("/")):
                # Flat file: arm is the filename minus the _sN seed tag.
                import re as _re
                arm = _re.sub(r"(_s\d+)?(_texture)?$", "",
                              os.path.splitext(os.path.basename(path))[0])
            else:
                arm = s["variant"]
            rows.append({
                "arm": arm,
                "variant": s["variant"],
                "override": ov,
                "seed": s.get("seed", 0),
                "lambda_gp": next(
                    (float(p.split("=")[1]) for p in ov.split(",")
                     if p.startswith("gradient_penalty_lambda")),
                    hp.get("gradient_penalty_lambda", 0.0)),
                "d_dim": next(
                    (int(p.split("=")[1]) for p in ov.split(",")
                     if p.startswith("discriminator_dim")),
                    hp.get("discriminator_dim", 96)),
                "recovery": s.get("texture_recovery"),
                "val_mel": round(s.get("final_validation", {}).get(
                    "Validation mel loss", float("nan")), 3),
                "gen_temporal_std": round(
                    s["generated"]["temporal_std"], 4),
                "real_temporal_std": round(s["real"]["temporal_std"], 4),
                "train_seconds": s.get("train_seconds"),
                "path": path,
            })

    rows.sort(key=lambda r: (r["arm"], r["seed"]))
    hdr = ("arm", "seed", "lambda_gp", "d_dim", "recovery", "val_mel")
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r[k]) for k in hdr))
    # Per-arm aggregates (mean over seeds) for the frontier plot/table.
    by_arm = {}
    for r in rows:
        by_arm.setdefault(r["arm"], []).append(r)
    print()
    for arm, rs in sorted(by_arm.items()):
        rec = [r["recovery"] for r in rs if r["recovery"] is not None]
        mel = [r["val_mel"] for r in rs]
        if rec:
            print(f"{arm}: n={len(rec)} recovery mean "
                  f"{sum(rec) / len(rec):.3f} "
                  f"[{min(rec):.3f}, {max(rec):.3f}] "
                  f"val_mel mean {sum(mel) / len(mel):.3f}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
