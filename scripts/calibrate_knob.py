#!/usr/bin/env python
"""Closed-loop validation of post-hoc knob calibration (VERDICT r4 #3).

For a trained continuous-knob checkpoint: measure the code->level curve
over an EXTENDED code range (the extrapolation result — the knob stays
live outside the training box), fit ``eval.calibration.KnobCalibration``,
then CLOSE THE LOOP: request target levels spanning the real factor
range, synthesize at the calibrated codes with FRESH nuisance draws, and
score how close the decoded levels land. Reports per-target error in
units of the real range — the number a serving user cares about
("ask for -2 dB, get -2 dB"), which raw range coverage does not give.

CPU-runnable. Usage:
  GANTRON_PLATFORM=cpu python scripts/calibrate_knob.py --seed 0
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STUDY_TEXT = "aeioumnst"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--study_root", default="/tmp/contstudy")
    parser.add_argument("--variant", default="cont_warm")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lo", type=float, default=-0.45)
    parser.add_argument("--hi", type=float, default=1.45)
    parser.add_argument("--n_codes", type=int, default=21)
    parser.add_argument("--code_draws", type=int, default=8)
    parser.add_argument("--n_targets", type=int, default=5)
    parser.add_argument("--check_draws", type=int, default=8,
                        help="fresh nuisance draws per requested level")
    parser.add_argument("--evidence", default="docs/evidence_r5/continuous")
    parser.add_argument("--evidence_name", default=None,
                        help="campaign JSON filename (default "
                             "<variant>_s<seed>.json); e.g. "
                             "cont_warm_cap045_s0.json for the "
                             "calibrated-cap arms, whose checkpoints use "
                             "the cont_warm architecture")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from _study_common import small_model_params
    from gan_continuous_study import VARIANTS
    from gantron_tpu.config import HParams
    from gantron_tpu.data.toy import MODEBAND_SCORE
    from gantron_tpu.eval.calibration import KnobCalibration, measure_knob
    from gantron_tpu.eval.mode_study import band_channels, hiband_level
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.utils.loading import load_generator

    tag = f"_s{args.seed}" if args.seed else ""
    arm_dir = os.path.join(args.study_root, args.variant + tag)
    evidence_name = (args.evidence_name
                     or f"{args.variant}_s{args.seed}.json")
    with open(os.path.join(args.evidence, evidence_name)) as f:
        campaign = json.load(f)
    real_p5 = campaign["real_curve"]["p5"]
    real_p95 = campaign["real_curve"]["p95"]

    hp = HParams()
    hp.add_params(small_model_params(campaign["iterations"]))
    hp.add_params(dict(use_noise=True, noise_size=32, use_labels=False,
                       seed=5321 + args.seed))
    hp.add_params(VARIANTS[args.variant])

    model, variables = load_generator(CheckpointManager(arm_dir).latest(), hp)
    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)
    channels = band_channels(hp, *MODEBAND_SCORE)
    score = lambda mel: hiband_level(mel, channels)  # noqa: E731

    # --- fit on the extended sweep (seed offset: calibration draws must
    # differ from the validation draws below) ---------------------------
    codes, levels = measure_knob(
        model, variables, hp, seq, score,
        code_values=np.linspace(args.lo, args.hi, args.n_codes),
        n_draws=args.code_draws, seed=args.seed)
    cal = KnobCalibration.fit(codes, levels)

    # --- closed loop: request levels spanning the real range -----------
    targets = np.linspace(real_p5, real_p95, args.n_targets)
    k = jax.random.PRNGKey(9000 + args.seed)
    rows = []
    for t_i, target in enumerate(targets):
        styles = []
        for d in range(args.check_draws):
            styles.append(cal.style_for_level(
                target, jax.random.fold_in(k, t_i * 100 + d),
                hp.noise_size))
        style = jnp.concatenate(styles, axis=0)
        text = jnp.broadcast_to(jnp.asarray(seq[None]),
                                (args.check_draws, len(seq)))
        out = model.apply(
            variables, text, style, None, None, hp.max_decoder_steps,
            method=model.infer,
            rngs={"dropout": jax.random.fold_in(k, 7000 + t_i),
                  "noise": jax.random.fold_in(k, 8000 + t_i)})
        mels, lens = np.asarray(out[1]), np.asarray(out[4])
        got = np.array([score(mels[i, :, : max(int(lens[i]), 2)])
                        for i in range(mels.shape[0])])
        rows.append({"target": round(float(target), 4),
                     "code": round(float(cal.code_for_level(target)), 4),
                     "achieved_mean": round(float(got.mean()), 4),
                     "achieved_std": round(float(got.std()), 4),
                     "abs_err": round(float(abs(got.mean() - target)), 4)})

    real_range = real_p95 - real_p5
    errs = np.array([r["abs_err"] for r in rows])
    result = {
        "variant": args.variant,
        "seed": args.seed,
        "checkpoint": CheckpointManager(arm_dir).latest(),
        "real_range": round(real_range, 4),
        "calibration_coverage": round(cal.coverage(real_p5, real_p95), 4),
        "campaign_coverage_in_box": campaign["control"]["range_coverage"],
        "knob_sign": cal.sign,
        "targets": rows,
        "mean_abs_err": round(float(errs.mean()), 4),
        "mean_abs_err_frac_of_range": round(float(errs.mean()) / real_range,
                                            4),
        "max_abs_err_frac_of_range": round(float(errs.max()) / real_range, 4),
        "calibration": json.loads(cal.to_json()),
        "device": str(jax.devices()[0]),
    }
    # Derive the default output from the EVIDENCE name, not the variant:
    # calibrating a cap045 checkpoint (--evidence_name
    # cont_warm_cap045_s0.json) must not overwrite the plain arm's
    # calibrated_cont_warm_s0.json.
    out_path = args.output or os.path.join(
        args.evidence, f"calibrated_{evidence_name}")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("calibration", "checkpoint")}, indent=2))


if __name__ == "__main__":
    main()
