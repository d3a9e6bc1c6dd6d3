#!/usr/bin/env python
"""Continuous latent control: is the noise vector a monotone KNOB?

Every identification campaign so far hid DISCRETE factors (one bit, two
bits, a 4-level joint space) and measured chi-square mode attribution.
But the reference's designed latent is a CONTINUOUS noise vector
(reference model.py:184-191, 273-279) — and the measured watermarking of
the ladder's continuous-code arms (docs/TRAINING_EVIDENCE.md "The
identification ladder") always faced a BINARY hidden factor, so the
code/factor topology mismatch is a confound: a continuum asked to encode
two modes has spare capacity that off-manifold watermarks can absorb.

This study matches the topologies. ``data.toy.build_leveled_corpus``
hides one CONTINUOUS factor (a [4.0, 4.8] kHz marker whose amplitude
sweeps 18 dB log-uniformly with u ~ U(0,1), hidden from text/labels), and
the arms ask whether a 1-dim continuous code becomes a monotone control
knob for it:

  * CONTROL — sweep the code dim over [0.05, 0.95] with shared nuisance
    draws and score the decoded band level (eval.mode_study.
    continuous_control_stats): pooled Spearman + permutation p,
    monotonicity, achieved-vs-real range coverage, between/within spread.
  * ATTRIBUTION — the random-style grid (eval.sampling.
    attribution_level_grid, the campaign's shared instrument): Spearman
    between the DRAWN style's code-dim value and the decoded level —
    control without a designed sweep.
  * FIDELITY — final validation losses; a knob bought with off-manifold
    watermarks shows up here (the ladder's measured failure mode).

Arms: ``nogan`` (MSE floor), ``rollout`` (distribution pressure, no
identification — the stable-manifold control), ``cont_warm`` (the ladder
endpoint's warm-started identification with a 1-dim CONTINUOUS code —
style_code_levels=0), ``cont_bit4`` (the same knob quantized to 4 levels:
what discretization costs against a continuum).

Usage: python scripts/gan_continuous_study.py --variant cont_warm --seed 0
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_WARM = {
    "adversarial_rollouts": True,
    "style_reconstruction_weight": 10.0,
    "diversity_weight": 1.0,
    "diversity_cap": 0.9,
    "identification_warmup": 1000,
    "validation_sample_diversity": 8,
    "style_code_dims": 1,
}

VARIANTS = {
    "nogan": {"d_freq": 0, "disc_warmp_up": 0},
    "rollout": {"adversarial_rollouts": True},
    # Continuous 1-dim code: topology-matched to the hidden continuum.
    "cont_warm": dict(_WARM, style_code_levels=0),
    # The discrete-knob comparison: 4 levels facing the same continuum.
    "cont_bit4": dict(_WARM, style_code_levels=4),
}

STUDY_TEXT = "aeioumnst"
N_CODES = 11
CODE_LO, CODE_HI = 0.05, 0.95


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", choices=sorted(VARIANTS),
                        default="cont_warm")
    parser.add_argument("-o", "--output", default="/tmp/continuousstudy")
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--n_utts", type=int, default=200)
    parser.add_argument("--n_styles", type=int, default=16)
    parser.add_argument("--n_dropout", type=int, default=8)
    parser.add_argument("--code_draws", type=int, default=8,
                        help="nuisance draws per swept code value")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hparams", type=str, default=None)
    parser.add_argument("--analyze_only", action="store_true")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from _study_common import final_validation, small_model_params
    from gantron_tpu.config import HParams
    from gantron_tpu.data.toy import MODEBAND_SCORE, build_leveled_corpus
    from gantron_tpu.eval.mode_study import (band_channels,
                                             compute_real_levels,
                                             continuous_control_stats,
                                             hiband_level)
    from gantron_tpu.eval.sampling import attribution_level_grid
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.loading import load_generator
    from gantron_tpu.utils.logging import MetricLogger

    corpus_root = os.path.join(args.output, f"corpus{args.seed}"
                               if args.seed else "corpus")
    os.makedirs(corpus_root, exist_ok=True)
    wav_dir, train_list, val_list, levels_by_name = build_leveled_corpus(
        corpus_root, n_utts=args.n_utts, seed=args.seed)

    hp = HParams()
    hp.add_params(small_model_params(args.iterations))
    hp.add_params(dict(
        use_noise=True, noise_size=32, use_labels=False,
        seed=5321 + args.seed,
        training_files=[train_list], validation_files=[val_list],
    ))
    hp.add_params(VARIANTS[args.variant])
    if args.hparams:
        hp.add_params_string(args.hparams)

    out = os.path.join(args.output, args.variant
                       + (f"_s{args.seed}" if args.seed else ""))
    if args.analyze_only:
        iteration, train_seconds = None, None
    else:
        logger = MetricLogger(out, run_name=args.variant)
        t0 = time.time()
        state, iteration = train(out, None, False, hp, wav_dir, logger=logger)
        train_seconds = round(time.time() - t0, 1)

    final_val = final_validation(
        os.path.join(out, f"{args.variant}.metrics.jsonl"))

    channels = band_channels(hp, *MODEBAND_SCORE)
    real = compute_real_levels(train_list, wav_dir, levels_by_name, hp,
                               channels=channels)

    ckpt_path = CheckpointManager(out).latest()
    if iteration is None:
        iteration = int(os.path.basename(ckpt_path)
                        .split("iter=")[1].split("_")[0])
    model, variables = load_generator(ckpt_path, hp)
    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)[None]

    infer = jax.jit(lambda v, text, style, kd, kn: model.apply(
        v, text, style, None, None, hp.max_decoder_steps,
        method=model.infer, rngs={"dropout": kd, "noise": kn}))

    # --- CONTROL: sweep the code dim with shared nuisance draws ---------
    S = args.code_draws
    code_values = np.linspace(CODE_LO, CODE_HI, N_CODES)
    k_nuis, k_run = jax.random.split(jax.random.PRNGKey(77 + args.seed))
    nuis = jax.random.uniform(k_nuis, (S, 1, hp.noise_size))
    style_grid = jnp.tile(nuis, (N_CODES, 1, 1))  # code-major
    style_grid = style_grid.at[:, 0, 0].set(
        jnp.repeat(jnp.asarray(code_values, jnp.float32), S))
    sweep_text = jnp.broadcast_to(jnp.asarray(seq),
                                  (N_CODES * S, seq.shape[1]))
    sweep_out = infer(variables, sweep_text, style_grid,
                      jax.random.fold_in(k_run, 0),
                      jax.random.fold_in(k_run, 1))
    mels = np.asarray(sweep_out[1])
    lens = np.asarray(sweep_out[4])
    sweep_levels = np.array([
        hiband_level(mels[i, :, : max(int(lens[i]), 2)], channels)
        for i in range(mels.shape[0])]).reshape(N_CODES, S)
    control = continuous_control_stats(code_values, sweep_levels,
                                       real_p5=real["p5"],
                                       real_p95=real["p95"],
                                       seed=args.seed)

    # --- ATTRIBUTION: the shared random-style grid, scored continuously -
    grid = attribution_level_grid(model, variables, hp, seq, channels,
                                  n_styles=args.n_styles,
                                  n_dropout=args.n_dropout, seed=args.seed)
    # Regenerate the grid's style draws (same key schedule as
    # eval.sampling.attribution_level_grid) to read off each row's
    # code-dim value.
    k_style, _ = jax.random.split(jax.random.PRNGKey(100 + args.seed))
    drawn = np.asarray(jax.random.uniform(
        k_style, (args.n_styles, 1, hp.noise_size)))[:, 0, 0]
    attribution = continuous_control_stats(drawn, np.asarray(grid),
                                           real_p5=real["p5"],
                                           real_p95=real["p95"],
                                           seed=args.seed)

    result = {
        "variant": args.variant,
        "hparams": {k: v for k, v in VARIANTS[args.variant].items()},
        "hparams_override": args.hparams,
        "iterations": iteration,
        "train_seconds": train_seconds,
        "seed": args.seed,
        "final_validation": final_val,
        "real_curve": {k: v for k, v in real.items()
                       if k not in ("u", "band_level")},
        "control": control,
        "attribution": attribution,
        "n_utts": args.n_utts,
        "analyze_only": args.analyze_only,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out, "continuous_study.json"), "w") as f:
        json.dump(dict(result, real_curve=real), f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
