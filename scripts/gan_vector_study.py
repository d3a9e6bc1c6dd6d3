#!/usr/bin/env python
"""Vector latent control: do TWO continuous code dims become TWO knobs?

The continuous study (scripts/gan_continuous_study.py) proved the
reference's designed latent — a continuous noise vector (reference
model.py:184-191, 273-279) — is a reproducible monotone knob when ONE
continuous factor is hidden and ONE code dim identifies it (3/3 seeds,
|rho| 0.92-1.00). The factorial study proved a 2-DIM code disentangles
two DISCRETE bits (subset redraw, 3/3 joint identification). This study
composes both results into the reference's actual promise: a noise
VECTOR as a panel of independent continuous knobs.

``data.toy.build_bileveled_corpus`` hides two independent continuous
factors (marker level u_a on [4.0,4.8] kHz, u_b on >=5.4 kHz, both
~ U(0,1) over an 18 dB log-sweep, hidden from text/labels). Each arm is
scored by:

  * CONTROL MATRIX — sweep EACH code dim over [0.05, 0.95] (11 values x
    8 shared nuisance draws; the other code dim rides in the nuisance, so
    it is held constant within a draw) and score BOTH bands on every
    decode: a 2x2 matrix of continuous_control_stats. Identification =
    the |rho| matrix has an injective argmax assignment, each dim's
    own-band knob is significant (perm p), and its cross-band |rho| is
    small — the continuous analog of the factorial study's injective
    binding.
  * ATTRIBUTION MATRIX — the shared random-style grid
    (eval.sampling.attribution_level_grid, both bands scored on the SAME
    decodes): Spearman between each drawn code dim and each band's
    decoded level — control without a designed sweep.
  * FIDELITY — final validation losses (a knob bought with off-manifold
    watermarks shows up here).

Arms: ``nogan`` (MSE floor / instrument anchor) and ``vec_warm`` (the
continuous campaign's endpoint config with style_code_dims=2 and the
factorial campaign's diversity_subset_redraw). The base arm keeps the
campaign default diversity_cap=0.9; the corpus's MEASURED on-manifold
maximum (same-text corner renders u=(0.05,0.05) vs (0.95,0.95), 6 texts
x 4 draws) is 0.676 +/- 0.011 (one-band swing 0.452, within-level
jitter 0.298 — the disjoint bands' contributions add on the shared
jitter floor, not linearly), so 0.9 sits 1.33x above it — the leveled
corpus's mis-calibration pathology, milder. The calibration recipe's
arm is `run_study.py --arm vector/vec_warm_cap068`.

Usage: python scripts/gan_vector_study.py --variant vec_warm --seed 0
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "nogan": {"d_freq": 0, "disc_warmp_up": 0},
    "vec_warm": {
        "adversarial_rollouts": True,
        "style_reconstruction_weight": 10.0,
        "diversity_weight": 1.0,
        "diversity_cap": 0.9,
        "identification_warmup": 1000,
        "validation_sample_diversity": 8,
        "style_code_dims": 2,
        "style_code_levels": 0,
        "diversity_subset_redraw": True,
    },
}

STUDY_TEXT = "aeioumnst"
N_CODES = 11
CODE_LO, CODE_HI = 0.05, 0.95
BAND_NAMES = ("band_a", "band_b")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", choices=sorted(VARIANTS),
                        default="vec_warm")
    parser.add_argument("-o", "--output", default="/tmp/vectorstudy")
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
    from gantron_tpu.data.toy import (MODEBAND_SCORE, TEXBAND_SCORE,
                                      build_bileveled_corpus)
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
    wav_dir, train_list, val_list, levels_by_name = build_bileveled_corpus(
        corpus_root, n_utts=args.n_utts, seed=args.seed)

    hp = HParams()
    hp.add_params(small_model_params(args.iterations))
    hp.add_params(dict(
        use_noise=True, noise_size=32, use_labels=False,
        seed=6321 + args.seed,
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

    channels = [band_channels(hp, *MODEBAND_SCORE),
                band_channels(hp, TEXBAND_SCORE)]
    real = [compute_real_levels(
        train_list, wav_dir, {n: uv[b] for n, uv in levels_by_name.items()},
        hp, channels=channels[b]) for b in range(2)]

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

    # --- CONTROL MATRIX: sweep each code dim, score both bands ----------
    S = args.code_draws
    code_values = np.linspace(CODE_LO, CODE_HI, N_CODES)
    k_nuis, k_run = jax.random.split(jax.random.PRNGKey(77 + args.seed))
    nuis = jax.random.uniform(k_nuis, (S, 1, hp.noise_size))
    sweep_text = jnp.broadcast_to(jnp.asarray(seq),
                                  (N_CODES * S, seq.shape[1]))
    control = {}
    rho = np.zeros((2, 2))
    for dim in range(2):
        style_grid = jnp.tile(nuis, (N_CODES, 1, 1))  # code-major
        style_grid = style_grid.at[:, 0, dim].set(
            jnp.repeat(jnp.asarray(code_values, jnp.float32), S))
        sweep_out = infer(variables, sweep_text, style_grid,
                          jax.random.fold_in(k_run, 2 * dim),
                          jax.random.fold_in(k_run, 2 * dim + 1))
        mels = np.asarray(sweep_out[1])
        lens = np.asarray(sweep_out[4])
        per_band = {}
        for b, bname in enumerate(BAND_NAMES):
            sweep_levels = np.array([
                hiband_level(mels[i, :, : max(int(lens[i]), 2)], channels[b])
                for i in range(mels.shape[0])]).reshape(N_CODES, S)
            stats = continuous_control_stats(
                code_values, sweep_levels, real_p5=real[b]["p5"],
                real_p95=real[b]["p95"], seed=args.seed)
            per_band[bname] = stats
            rho[dim, b] = stats["spearman"]
        control[f"dim{dim}"] = per_band

    # Disentanglement summary over the |rho| matrix: each dim's claimed
    # band is its argmax; the vector is identified iff the assignment is
    # injective and each dim's own-band knob dominates its cross-band
    # leakage (min margin > 0 — continuous analog of injective binding).
    assign = [int(np.argmax(np.abs(rho[d]))) for d in range(2)]
    margins = [float(np.abs(rho[d, assign[d]])
                     - np.abs(rho[d, 1 - assign[d]])) for d in range(2)]
    summary = {
        "rho_matrix": [[round(float(v), 4) for v in row] for row in rho],
        "assignment": assign,
        "injective": len(set(assign)) == 2,
        "own_band_rho": [round(float(rho[d, assign[d]]), 4)
                         for d in range(2)],
        "own_band_perm_p": [
            control[f"dim{d}"][BAND_NAMES[assign[d]]]["perm_p"]
            for d in range(2)],
        "margins": [round(m, 4) for m in margins],
        "min_margin": round(min(margins), 4),
    }

    # --- ATTRIBUTION MATRIX: random styles, both bands, same decodes ----
    from scipy import stats as sstats

    grid = np.asarray(attribution_level_grid(
        model, variables, hp, seq, channels, n_styles=args.n_styles,
        n_dropout=args.n_dropout, seed=args.seed))  # (N, M, 2)
    k_style, _ = jax.random.split(jax.random.PRNGKey(100 + args.seed))
    drawn = np.asarray(jax.random.uniform(
        k_style, (args.n_styles, 1, hp.noise_size)))[:, 0, :2]
    attribution = {
        f"dim{d}": {
            bname: round(float(sstats.spearmanr(
                np.repeat(drawn[:, d], args.n_dropout),
                grid[:, :, b].reshape(-1)).statistic), 4)
            for b, bname in enumerate(BAND_NAMES)}
        for d in range(2)}

    result = {
        "variant": args.variant,
        "hparams": {k: v for k, v in VARIANTS[args.variant].items()},
        "hparams_override": args.hparams,
        "iterations": iteration,
        "train_seconds": train_seconds,
        "seed": args.seed,
        "final_validation": final_val,
        "real_curves": {BAND_NAMES[b]: {k: v for k, v in real[b].items()
                                        if k not in ("u", "band_level")}
                        for b in range(2)},
        "control": control,
        "summary": summary,
        "attribution": attribution,
        "n_utts": args.n_utts,
        "analyze_only": args.analyze_only,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out, "vector_study.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
