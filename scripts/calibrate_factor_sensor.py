#!/usr/bin/env python
"""Measure whether a FACTOR-AWARE separation probe can see factor collapse.

The factorial campaign (docs/TRAINING_EVIDENCE.md "Factorial scaling
study") found the shipped collapse sensor blind to factor collapse: every
factorial collapse kept the diagonal code-separation ratio inside the
single-bit-calibrated healthy band, because the code retains a visible
output effect while a FACTOR collapses. The designed follow-up is a
per-dim probe (eval.sampling.separation_grid_styles ``dim=``): sweep ONE
code dim with the other dims and nuisance shared per draw, so the
between-level contrast isolates that dim's output control.

This script replays the diagonal AND per-dim statistics on the factorial
campaign's final checkpoints (known per-band ground truth from each arm's
factorial_study.json) and reports whether any of them separates
"band identified" from "band collapsed" arms — the same
falsify-before-shipping gate the single-factor sensor went through twice
(scripts/calibrate_rescue_floor.py docstring).

Usage: python scripts/calibrate_factor_sensor.py [-o /tmp/factorial_r4]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default="/tmp/factorial_r4")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from _study_common import small_model_params
    from gan_factorial_study import VARIANTS
    from gantron_tpu.config import HParams
    from gantron_tpu.eval.sampling import latent_separation
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import prepare_dataloaders
    from gantron_tpu.utils.loading import load_generator

    rows = []
    for name in sorted(os.listdir(args.output)):
        arm_dir = os.path.join(args.output, name)
        meta_path = os.path.join(arm_dir, "factorial_study.json")
        if not os.path.isfile(meta_path):
            continue
        meta = json.load(open(meta_path))
        variant, arm_seed = meta["variant"], meta["seed"]
        code_dims = int(VARIANTS[variant].get("style_code_dims", 0) or 0)
        if code_dims < 2:
            continue  # the factor-aware probe is only distinct there
        root = os.path.dirname(arm_dir)
        corpus_root = os.path.join(
            root, f"corpus{arm_seed}" if arm_seed else "corpus")
        hp = HParams()
        hp.add_params(small_model_params(meta["iterations"]))
        hp.add_params(dict(
            use_noise=True, noise_size=32, use_labels=False,
            seed=5321 + arm_seed,
            training_files=[os.path.join(corpus_root, "train.txt")],
            validation_files=[os.path.join(corpus_root, "val.txt")],
        ))
        hp.add_params(VARIANTS[variant])
        if meta.get("hparams_override"):
            hp.add_params_string(meta["hparams_override"])
        ckpt_path = CheckpointManager(arm_dir).latest()
        if ckpt_path is None:
            continue
        model, variables = load_generator(ckpt_path, hp)
        _, val_loader = prepare_dataloaders(
            hp, os.path.join(corpus_root, "wavs") + os.sep)
        batch = next(iter(val_loader))
        t_len = max(int(np.asarray(batch.text_lengths)[0]), 1)
        text = jnp.asarray(np.asarray(batch.text)[:1, :t_len], jnp.int32)
        key = jax.random.fold_in(jax.random.PRNGKey(hp.seed + 17), 0)
        diag, spread = latent_separation(model, variables, hp, text, key)
        per_dim = [latent_separation(model, variables, hp, text, key,
                                     dim=d)[0] for d in range(code_dims)]
        band_p = (meta["attribution_a"]["per_style_chi2_p"],
                  meta["attribution_b"]["per_style_chi2_p"])
        bands_identified = sum(1 for p in band_p if p < 0.01)
        row = dict(arm=name, variant=variant, seed=arm_seed,
                   iterations=meta["iterations"],
                   diagonal=round(float(diag), 4),
                   per_dim=[round(float(r), 4) for r in per_dim],
                   min_dim=round(float(min(per_dim)), 4),
                   spread=round(float(spread), 4),
                   band_p=band_p, bands_identified=bands_identified,
                   coverage=(meta.get("coverage") or {}).get("coverage"))
        rows.append(row)
        print(f"{name:<22s} diag={row['diagonal']:<7.3f} "
              f"per_dim={row['per_dim']} min={row['min_dim']:<7.3f} "
              f"bands_identified={bands_identified} "
              f"coverage={row['coverage']}", flush=True)

    both = [r["min_dim"] for r in rows if r["bands_identified"] == 2]
    partial = [r["min_dim"] for r in rows if r["bands_identified"] == 1]
    none = [r["min_dim"] for r in rows if r["bands_identified"] == 0]
    summary = dict(rows=rows, statistic="min over code dims of the per-dim "
                   "code_separation_ratio",
                   min_dim_both_bands=sorted(both),
                   min_dim_one_band=sorted(partial),
                   min_dim_no_band=sorted(none))
    sep = None
    if both and (partial or none):
        worst_healthy = min(both)
        best_sick = max(partial + none)
        sep = worst_healthy > best_sick
        summary["separates"] = bool(sep)
        if sep:
            summary["recommended_factor_floor"] = round(
                float(np.sqrt(worst_healthy * best_sick)), 4)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"},
                     indent=2))
    out_path = os.path.join(args.output, "factor_sensor_calibration.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
