#!/usr/bin/env python
"""Calibrate ``diversity_rescue_floor`` from measured checkpoints.

The collapse-rescue controller (train/loop.py, config.py
diversity_rescue_*) trips when the in-loop latent-separation probe
leaves its calibrated band. This script puts NUMBERS on the band: it replays the
EXACT probe statistic loop.py computes (eval.sampling.latent_separation —
between-code / within-code distance ratio on a (levels x draws) decode
grid of the first validation text) on the final checkpoints of the
composed-capstone study arms — which include both measured-healthy seeds
(identification chi^2 p < 1e-6) and measured-collapsed seeds (consistency
floor 1.0, every sample in one mode) — and prints the two bands. The
floor belongs between them.

History — two falsified sensor designs, both killed by this script's
runs on real collapsed checkpoints:

1. Raw free-running pairwise spread: collapsed arms kept spreads of
   0.62-0.81 INSIDE the healthy band 0.72-1.64, because prenet dropout
   supplies free-running diversity whether or not the latent is alive.
2. A FLOOR on the separation ratio (expecting collapse = ratio ~ 1,
   latent output-invisible): every measured collapse under
   identification pressure scored ratio 9.1-18.2, ABOVE the healthy
   band 2.1-7.6 — including the bimodal campaign's all-one-mode
   bit_warm seed (9.12, measured from
   /tmp/modestudy_r4b/infogan_bit_warm). The Q loss keeps the code
   decodable from the output, so collapse presents as the code's
   effect migrating to an off-manifold channel with outsized L1, never
   as invisibility. Ratio ~ 1 occurs only without identification terms
   (nogan 0.94).

Hence the controller bounds the ratio from BOTH sides (config.py
diversity_rescue_floor / diversity_rescue_ceiling) and this script
recommends whichever bound the measured bands support. Both statistics
are still recorded per arm for the record.

The floor is calibrated over IDENTIFICATION arms only
(style_reconstruction_weight > 0): the controller multiplies exactly
those loss terms (loop.py fail-fasts when the floor is set without
identification terms).

Usage: python scripts/calibrate_rescue_floor.py [-o /tmp/composedstudy]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def probe_statistics(arm_dir, hp, wavs_path):
    """The loop.py rescue-probe statistics at the arm's final checkpoint.

    Mirrors train/loop.py's probe construction exactly: the text is row 0
    of the first validation batch (truncated to its true length), decoded
    as the latent-separation grid. Returns (separation_ratio, spread).
    """
    import jax.numpy as jnp

    from gantron_tpu.eval.sampling import latent_separation
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import prepare_dataloaders
    from gantron_tpu.utils.loading import load_generator

    ckpt_path = CheckpointManager(arm_dir).latest()
    if ckpt_path is None:
        return None, None
    model, variables = load_generator(ckpt_path, hp)
    _, val_loader = prepare_dataloaders(hp, wavs_path)
    batch = next(iter(val_loader))
    t_len = max(int(np.asarray(batch.text_lengths)[0]), 1)
    text = jnp.asarray(np.asarray(batch.text)[:1, :t_len], jnp.int32)
    # loop.py folds the probe key by iteration; the final checkpoint's
    # iteration count is the meta's iterations value, but the statistic is
    # an average over many pairs — key choice moves it by noise. Use the
    # same base key at fold 0 for reproducibility.
    import jax

    key = jax.random.fold_in(jax.random.PRNGKey(hp.seed + 17), 0)
    return latent_separation(model, variables, hp, text, key)


def _arm_row(arm_dir, name, variants, meta, ident, seed_base):
    """Score one study arm with the exact in-loop probe statistics."""
    from _study_common import small_model_params
    from gantron_tpu.config import HParams

    variant, arm_seed = meta["variant"], meta["seed"]
    root = os.path.dirname(arm_dir)
    corpus_root = os.path.join(
        root, f"corpus{arm_seed}" if arm_seed else "corpus")
    wav_dir = os.path.join(corpus_root, "wavs") + os.sep
    hp = HParams()
    hp.add_params(small_model_params(meta["iterations"]))
    hp.add_params(dict(
        use_noise=True, noise_size=32, use_labels=False,
        seed=seed_base + arm_seed,
        training_files=[os.path.join(corpus_root, "train.txt")],
        validation_files=[os.path.join(corpus_root, "val.txt")],
    ))
    hp.add_params(variants[variant])
    if meta.get("hparams_override"):
        hp.add_params_string(meta["hparams_override"])
    ratio, spread = probe_statistics(arm_dir, hp, wav_dir)
    identifying = float(variants[variant].get(
        "style_reconstruction_weight", 0.0)) > 0
    collapsed = ident["consistency_chance_floor"] >= 0.999
    row = dict(arm=name, variant=variant, seed=arm_seed,
               separation=ratio, spread=spread,
               collapsed=bool(collapsed),
               identification_arm=identifying,
               chi2=ident["per_style_chi2"])
    print(f"{name:<22s} separation={ratio:.4f} spread={spread:.4f} "
          f"{'COLLAPSED' if collapsed else 'healthy':<9s} "
          f"chi2={ident['per_style_chi2']:.1f}"
          f"{'' if identifying else '  (non-identification arm)'}",
          flush=True)
    return row


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default="/tmp/composedstudy")
    parser.add_argument(
        "--mode_study_dir", default=None,
        help="optionally include bimodal-campaign arms "
        "(scripts/gan_mode_study.py layout, e.g. /tmp/modestudy_r4b) — "
        "their collapsed seeds are extra calibration points")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from gan_composed_study import VARIANTS

    rows = []
    for name in sorted(os.listdir(args.output)):
        arm_dir = os.path.join(args.output, name)
        meta_path = os.path.join(arm_dir, "composed_study.json")
        if not os.path.isfile(meta_path):
            continue
        meta = json.load(open(meta_path))
        rows.append(_arm_row(arm_dir, name, VARIANTS, meta,
                             meta["identification"], seed_base=4321))

    if args.mode_study_dir:
        from gan_mode_study import VARIANTS as MODE_VARIANTS

        for name in sorted(os.listdir(args.mode_study_dir)):
            arm_dir = os.path.join(args.mode_study_dir, name)
            meta_path = os.path.join(arm_dir, "mode_study.json")
            attr_path = os.path.join(arm_dir, "mode_attribution_best.json")
            if not (os.path.isfile(meta_path) and os.path.isfile(attr_path)):
                continue
            meta = json.load(open(meta_path))
            rows.append(_arm_row(arm_dir, f"bimodal:{name}", MODE_VARIANTS,
                                 meta, json.load(open(attr_path)),
                                 seed_base=1234))

    ident_rows = [r for r in rows if r["identification_arm"]]
    healthy = [r["separation"] for r in ident_rows if not r["collapsed"]]
    collapsed = [r["separation"] for r in ident_rows if r["collapsed"]]
    other = [r["separation"] for r in rows if not r["identification_arm"]]
    summary = dict(rows=rows,
                   statistic="code_separation_ratio",
                   healthy_band=[min(healthy), max(healthy)]
                   if healthy else None,
                   collapsed_band=[min(collapsed), max(collapsed)]
                   if collapsed else None,
                   non_identification_separations=other)
    if healthy and collapsed and min(collapsed) > max(healthy):
        # The measured direction: collapse INFLATES the ratio (the Q loss
        # keeps the code decodable, so its effect migrates off-manifold
        # with outsized L1) -> bound it with a CEILING.
        summary["recommended_ceiling"] = round(
            float(np.sqrt(min(collapsed) * max(healthy))), 4)
        print(f"\nidentification arms: healthy band <= {max(healthy):.4f}, "
              f"collapsed band >= {min(collapsed):.4f}, recommended "
              f"diversity_rescue_ceiling (geometric mid) = "
              f"{summary['recommended_ceiling']}")
    elif healthy and collapsed and min(healthy) > max(collapsed):
        summary["recommended_floor"] = round(
            float(np.sqrt(min(healthy) * max(collapsed))), 4)
        print(f"\nidentification arms: healthy band >= {min(healthy):.4f}, "
              f"collapsed band <= {max(collapsed):.4f}, recommended "
              f"diversity_rescue_floor (geometric mid) = "
              f"{summary['recommended_floor']}")
    elif healthy and collapsed:
        print(f"\nWARNING: bands overlap (healthy {min(healthy):.4f}-"
              f"{max(healthy):.4f} vs collapsed {min(collapsed):.4f}-"
              f"{max(collapsed):.4f}); no bound recommended")
    out_path = os.path.join(args.output, "rescue_floor_calibration.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
