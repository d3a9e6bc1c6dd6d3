#!/usr/bin/env python
"""Closed-loop validation of VectorCalibration on vector-study checkpoints.

The vector study measured that a 2-dim continuous code identifies the
bileveled corpus's two factors only up to ROTATION (TRAINING_EVIDENCE
"Vector control"): every dim is a significant knob but neither is
axis-aligned, and training time does not align them. This script tests
the designed consequence end-to-end on each trained checkpoint:

  1. FIT — sweep each code dim (the campaign's shared measure_knob
     protocol), score BOTH bands per decode, fit the linear control
     matrix ``levels ~ c + M (code - 0.5)`` (eval.calibration.
     VectorCalibration).
  2. REQUEST — build 9 joint targets (``--targets grid``: independent
     per-band 20/50/80% of the sweep-achieved range, the joint-
     reachability test; ``--targets box``: the forward model of 9
     in-box codes, the map-correctness test) and solve
     ``code = 0.5 + M^-1 (target - c)`` per target.
  3. VERIFY — decode the solved codes against fresh shared nuisance
     draws and measure what each band actually did. Success = each
     band's achieved level tracks ITS requested level (pooled Spearman)
     and not the OTHER band's, with hit error small against the real
     factor range — i.e. the rotated code serves as two independent
     axis-aligned virtual knobs.

Usage: python scripts/vector_unmix.py --root /tmp/vectorstudy --seeds 0 1 2
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STUDY_TEXT = "aeioumnst"
TARGET_FRACS = (0.2, 0.5, 0.8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/vectorstudy")
    parser.add_argument("--variant", default="vec_warm")
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    parser.add_argument("--n_draws", type=int, default=8)
    parser.add_argument("--targets", choices=("grid", "box"), default="grid",
                        help="'grid': independent per-band 3x3 targets "
                             "(joint reachability test — targets may fall "
                             "outside the code box's image and clip); "
                             "'box': targets are the forward model of 9 "
                             "in-box codes (map-correctness test — every "
                             "target reachable by construction)")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from scipy import stats as sstats

    from _study_common import small_model_params
    from gan_vector_study import VARIANTS
    from gantron_tpu.config import HParams
    from gantron_tpu.data.toy import (MODEBAND_SCORE, TEXBAND_SCORE,
                                      build_bileveled_corpus)
    from gantron_tpu.eval.calibration import VectorCalibration, measure_knob
    from gantron_tpu.eval.mode_study import (band_channels,
                                             compute_real_levels,
                                             hiband_level)
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.utils.loading import load_generator

    results = []
    for seed in args.seeds:
        corpus_root = os.path.join(args.root, f"corpus{seed}"
                                   if seed else "corpus")
        wav_dir, train_list, _, levels_by_name = build_bileveled_corpus(
            corpus_root, n_utts=200, seed=seed)

        hp = HParams()
        hp.add_params(small_model_params(6000))
        hp.add_params(dict(
            use_noise=True, noise_size=32, use_labels=False,
            seed=6321 + seed,
            training_files=[train_list], validation_files=[train_list],
        ))
        hp.add_params(VARIANTS[args.variant])

        out = os.path.join(args.root, args.variant
                           + (f"_s{seed}" if seed else ""))
        ckpt_path = CheckpointManager(out).latest()
        model, variables = load_generator(ckpt_path, hp)
        seq = np.asarray(
            text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)[None]
        channels = [band_channels(hp, *MODEBAND_SCORE),
                    band_channels(hp, TEXBAND_SCORE)]
        real = [compute_real_levels(
            train_list, wav_dir,
            {n: uv[b] for n, uv in levels_by_name.items()}, hp,
            channels=channels[b]) for b in range(2)]
        real_range = [max(real[b]["p95"] - real[b]["p5"], 1e-9)
                      for b in range(2)]

        def both_bands(mel):
            return np.array([hiband_level(mel, channels[0]),
                             hiband_level(mel, channels[1])])

        # 1. FIT ---------------------------------------------------------
        sweeps = [measure_knob(model, variables, hp, seq, both_bands,
                               n_draws=args.n_draws, seed=seed, code_dim=d)
                  for d in range(2)]
        cal = VectorCalibration.fit(sweeps)

        # 2. REQUEST -----------------------------------------------------
        achieved_band = []  # per band: sweep-achieved cell-mean range
        for b in range(2):
            cells = np.concatenate([
                lv.mean(axis=1)[:, b] for _, lv in sweeps])
            achieved_band.append((float(cells.min()), float(cells.max())))
        if args.targets == "box":
            # Map-correctness protocol: request what the fitted model says
            # 9 spread-out IN-BOX codes produce — reachable by
            # construction, so failures indict the calibration map, not
            # the box geometry.
            g = np.linspace(0.15, 0.85, 3)
            box_codes = np.array([[a, b] for a in g for b in g])
            targets = np.array([cal.levels_for_code(cd)
                                for cd in box_codes])
        else:
            t_a = [achieved_band[0][0]
                   + f * (achieved_band[0][1] - achieved_band[0][0])
                   for f in TARGET_FRACS]
            t_b = [achieved_band[1][0]
                   + f * (achieved_band[1][1] - achieved_band[1][0])
                   for f in TARGET_FRACS]
            targets = np.array([[a, b] for a in t_a for b in t_b])
        codes, in_box = zip(*[cal.code_for_levels(t) for t in targets])
        codes = np.stack(codes)

        # 3. VERIFY ------------------------------------------------------
        S, T = args.n_draws, targets.shape[0]
        k_nuis, k_run = jax.random.split(jax.random.PRNGKey(1234 + seed))
        nuis = jax.random.uniform(k_nuis, (S, 1, hp.noise_size))
        style = jnp.tile(nuis, (T, 1, 1))  # target-major
        for d in range(2):
            style = style.at[:, 0, d].set(
                jnp.repeat(jnp.asarray(codes[:, d], jnp.float32), S))
        text = jnp.broadcast_to(jnp.asarray(seq), (T * S, seq.shape[1]))
        infer = jax.jit(lambda v, t, s, kd, kn: model.apply(
            v, t, s, None, None, hp.max_decoder_steps,
            method=model.infer, rngs={"dropout": kd, "noise": kn}))
        o = infer(variables, text, style,
                  jax.random.fold_in(k_run, 0), jax.random.fold_in(k_run, 1))
        mels, lens = np.asarray(o[1]), np.asarray(o[4])
        ach = np.array([both_bands(mels[i, :, : max(int(lens[i]), 2)])
                        for i in range(T * S)]).reshape(T, S, 2)

        req = np.repeat(targets, S, axis=0).reshape(T, S, 2)
        stats = {}
        for b, bname in enumerate(("band_a", "band_b")):
            own = sstats.spearmanr(req[:, :, b].ravel(),
                                   ach[:, :, b].ravel())
            cross = sstats.spearmanr(req[:, :, 1 - b].ravel(),
                                     ach[:, :, b].ravel())
            # In box mode the 9 joint targets are themselves correlated
            # across bands (they are the image of a code grid under the
            # rotated M), so the raw cross-Spearman conflates that with
            # leakage; the PARTIAL cross — achieved_b residualized on its
            # own request, then ranked against the other request — is the
            # independence statistic that is valid in both modes.
            own_x, ach_b = req[:, :, b].ravel(), ach[:, :, b].ravel()
            slope, icpt = np.polyfit(own_x, ach_b, 1)
            partial = sstats.spearmanr(req[:, :, 1 - b].ravel(),
                                       ach_b - (slope * own_x + icpt))
            err = ach[:, :, b].mean(axis=1) - targets[:, b]
            stats[bname] = {
                "own_spearman": round(float(own.statistic), 4),
                "own_p": float(own.pvalue),
                "cross_spearman": round(float(cross.statistic), 4),
                "partial_cross_spearman": round(
                    float(partial.statistic), 4),
                "partial_cross_p": float(partial.pvalue),
                "rms_err_vs_real_range": round(
                    float(np.sqrt((err ** 2).mean())) / real_range[b], 4),
            }
        results.append({
            "seed": seed,
            "ckpt": os.path.basename(ckpt_path),
            "matrix": cal.matrix.tolist(),
            "intercept": cal.intercept.tolist(),
            "condition_number": round(cal.condition_number, 2),
            "in_box": int(sum(in_box)),
            "n_targets": T,
            "target_mode": args.targets,
            "achieved_band_ranges": achieved_band,
            "real_ranges": real_range,
            "validation": stats,
            "calibration_json": cal.to_json(),
        })
        print(json.dumps(results[-1], indent=2))

    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
