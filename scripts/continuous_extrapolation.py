#!/usr/bin/env python
"""Is the continuous knob's partial range coverage a GAIN limit or a
SATURATION limit? Free measurement on already-trained checkpoints.

The round-4/5 continuous campaign (docs/evidence_r5/continuous/) measured
seed-variable range coverage for the 1-dim continuous code (0.23 / 0.58 /
1.64 of the real 18 dB factor range) over the TRAINING code box
[0.05, 0.95]. Two readings are possible:

  * gain limit — the learned code->level map is roughly linear but too
    shallow; sweeping the code BEYOND the unit box keeps extending the
    level, so the full real range is reachable by post-hoc code
    calibration (serving fix, no retraining);
  * saturation limit — the map flattens at the box edge; the missing
    range was never identified and only retraining (e.g. the calibrated
    diversity cap, run_study.py continuous/cont_warm_cap045) can recover
    it.

This script sweeps each trained cont_warm checkpoint over an EXTENDED
code range (default [-0.45, 1.45], 21 points, same nuisance-draw
protocol as the campaign's control sweep) and reports in-box vs extended
achieved range + a per-edge saturation verdict. CPU-runnable (small
study model); point --study_root at the campaign output.

Usage:
  GANTRON_PLATFORM=cpu python scripts/continuous_extrapolation.py \
      --study_root /tmp/contstudy --seed 0
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STUDY_TEXT = "aeioumnst"  # the campaign's shared probe text
CODE_LO, CODE_HI = 0.05, 0.95  # training box (gan_continuous_study.py)


def _r4(x):
    return None if x is None else round(x, 4)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--study_root", default="/tmp/contstudy")
    parser.add_argument("--variant", default="cont_warm")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lo", type=float, default=-0.45)
    parser.add_argument("--hi", type=float, default=1.45)
    parser.add_argument("--n_codes", type=int, default=21)
    parser.add_argument("--code_draws", type=int, default=8)
    parser.add_argument("--evidence", default="docs/evidence_r5/continuous",
                        help="committed campaign JSONs (for the real-range "
                             "percentiles measured at training time)")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    import jax

    from _study_common import small_model_params
    from gan_continuous_study import VARIANTS
    from gantron_tpu.config import HParams
    from gantron_tpu.data.toy import MODEBAND_SCORE
    from gantron_tpu.eval.calibration import measure_knob
    from gantron_tpu.eval.mode_study import band_channels, hiband_level
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.utils.loading import load_generator

    tag = f"_s{args.seed}" if args.seed else ""
    arm_dir = os.path.join(args.study_root, args.variant + tag)
    evidence = os.path.join(args.evidence, f"{args.variant}_s{args.seed}.json")
    with open(evidence) as f:
        campaign = json.load(f)
    real_p5 = campaign["real_curve"]["p5"]
    real_p95 = campaign["real_curve"]["p95"]
    real_range = real_p95 - real_p5

    hp = HParams()
    hp.add_params(small_model_params(campaign["iterations"]))
    hp.add_params(dict(use_noise=True, noise_size=32, use_labels=False,
                       seed=5321 + args.seed))
    hp.add_params(VARIANTS[args.variant])

    model, variables = load_generator(CheckpointManager(arm_dir).latest(), hp)
    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)
    channels = band_channels(hp, *MODEBAND_SCORE)

    # The campaign's shared sweep protocol, via its one implementation
    # (eval.calibration.measure_knob — same key schedule as
    # gan_continuous_study.py's control sweep).
    code_values, levels = measure_knob(
        model, variables, hp, seq,
        score_fn=lambda mel: hiband_level(mel, channels),
        code_values=np.linspace(args.lo, args.hi, args.n_codes),
        n_draws=args.code_draws, seed=args.seed)
    cell_means = levels.mean(axis=1)

    in_box = (code_values >= CODE_LO - 1e-9) & (code_values <= CODE_HI + 1e-9)
    rng_in = float(cell_means[in_box].max() - cell_means[in_box].min())
    rng_ext = float(cell_means.max() - cell_means.min())

    # Per-edge saturation: slope (level units per code unit) just inside
    # the box vs in the extrapolated stretch beyond it. A slope ratio
    # near 0 = the map flattens at the edge (saturation); near 1 = the
    # knob keeps its gain outside the box (gain limit).
    def edge_slopes(side):
        step = code_values[1] - code_values[0]
        if side == "hi":
            inside = (code_values > CODE_HI - 3 * step) & in_box
            outside = code_values > CODE_HI + 1e-9
        else:
            inside = (code_values < CODE_LO + 3 * step) & in_box
            outside = code_values < CODE_LO - 1e-9

        def slope(mask):
            # A 1-point fit is underdetermined and an empty one raises;
            # report null rather than a garbage number (a sweep confined
            # to the training box has no outside points at all).
            if mask.sum() < 2:
                return None
            return float(np.polyfit(code_values[mask],
                                    cell_means[mask], 1)[0])

        return slope(inside), slope(outside)

    lo_in, lo_out = edge_slopes("lo")
    hi_in, hi_out = edge_slopes("hi")

    result = {
        "variant": args.variant,
        "seed": args.seed,
        "checkpoint": CheckpointManager(arm_dir).latest(),
        "code_values": [round(float(c), 4) for c in code_values],
        "cell_means": [round(float(m), 4) for m in cell_means],
        "cell_stds": [round(float(s), 4) for s in levels.std(axis=1)],
        "real_range": round(real_range, 4),
        "range_in_box": round(rng_in, 4),
        "range_extended": round(rng_ext, 4),
        "coverage_in_box": round(rng_in / real_range, 4),
        "coverage_extended": round(rng_ext / real_range, 4),
        "edge_slope_lo": {"inside": _r4(lo_in), "outside": _r4(lo_out)},
        "edge_slope_hi": {"inside": _r4(hi_in), "outside": _r4(hi_out)},
        "campaign_coverage": campaign["control"]["range_coverage"],
        "device": str(jax.devices()[0]),
    }
    out_path = args.output or os.path.join(
        args.evidence, f"extrapolation_{args.variant}_s{args.seed}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
