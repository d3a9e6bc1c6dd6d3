#!/usr/bin/env python
"""The composed capstone: ONE model delivering BOTH measured GAN values.

Round 4 measured the two halves of the GANtron value proposition on
separate corpora with separate models: the latent identifies and controls
the output MODE (infogan_bit_warm, bimodal corpus, chi^2 p < 1e-6 on 4/5
seeds) and the adversarial loss recovers per-frame TEXTURE where MSE blurs
(texture corpus, +23-29% base arms, gradient-penalty rollouts ~0.54
recovery). This study asks whether one model does both at once, on
``data.toy.build_composed_corpus``: a hidden mode bit on the [4.0, 4.8] kHz
band AND i.i.d. per-frame texture >= 5.4 kHz, scored on disjoint mel
channel bands (tests/test_mode_study.py validates the instrument).

Scores per arm:
  * identification: the mode_attribution N x M (style, dropout) grid on the
    MODE band — within_noise_consistency + per-style chi^2 vs the binomial
    dropout-only null (eval.mode_study.attribution_grid_stats).
  * texture: free-running texture_recovery on the TEXTURE band vs the real
    corpus anchor (eval.mode_study.texture_stats).

The reference cannot run this study: its noise input is injected but never
identified (reference model.py:184-191, 273-279; train.py:371-383 only
scores teacher-forced outputs), and its per-frame Python decode loop makes
rollout training infeasible.

Usage: python scripts/gan_composed_study.py --variant full --seed 0
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_BIT_WARM = {
    "adversarial_rollouts": True,
    "style_reconstruction_weight": 10.0,
    "diversity_weight": 1.0,
    "diversity_cap": 0.9,
    "style_code_dims": 1,
    "style_code_levels": 2,
    "identification_warmup": 1000,
}

VARIANTS = {
    # The composition: the identification campaign's best arm
    # (infogan_bit_warm, 4/5 seeds) + the texture study's best D constraint
    # (WGAN-GP instead of the 0.001 weight clip, texture_recovery 0.54 vs
    # 0.39 for clipped rollouts).
    "full": dict(_BIT_WARM, gradient_penalty_lambda=10.0),
    # Ablation: identification without the gradient penalty — how much
    # texture does the clipped-D version recover on this corpus?
    "bit_warm": dict(_BIT_WARM),
    # Floors: the MSE-only texture/identification floor.
    "nogan": {"d_freq": 0, "disc_warmp_up": 0},
}

STUDY_TEXT = "aeioumnst"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", choices=sorted(VARIANTS), default="full")
    parser.add_argument("-o", "--output", default="/tmp/composedstudy")
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--n_utts", type=int, default=200)
    parser.add_argument("--samples", type=int, default=40,
                        help="free-running samples for the texture score")
    parser.add_argument("--n_styles", type=int, default=16)
    parser.add_argument("--n_dropout", type=int, default=8)
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
    from gantron_tpu.data.dataset import TextMelDataset
    from gantron_tpu.data.toy import (MODEBAND_SCORE, TEXBAND_SCORE,
                                      build_composed_corpus)
    from gantron_tpu.eval.mode_study import (attribution_grid_stats,
                                             band_channels,
                                             compute_real_anchors,
                                             texture_stats)
    from gantron_tpu.eval.sampling import random_style
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.loading import load_generator
    from gantron_tpu.utils.logging import MetricLogger

    corpus_root = os.path.join(args.output, f"corpus{args.seed}"
                               if args.seed else "corpus")
    os.makedirs(corpus_root, exist_ok=True)
    wav_dir, train_list, val_list, modes = build_composed_corpus(
        corpus_root, n_utts=args.n_utts, seed=args.seed)

    hp = HParams()
    hp.add_params(small_model_params(args.iterations))
    hp.add_params(dict(
        use_noise=True, noise_size=32, use_labels=False,
        seed=4321 + args.seed,
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

    mode_ch = band_channels(hp, *MODEBAND_SCORE)
    tex_ch = band_channels(hp, TEXBAND_SCORE)
    anchors = compute_real_anchors(train_list, wav_dir, modes, hp,
                                   channels=mode_ch)

    # Real-corpus texture anchor via the SAME mel extraction the run
    # trained on.
    ds = TextMelDataset([train_list], hp, wav_dir)
    with open(train_list) as f:
        names = [line.split("|")[0] for line in f if line.strip()]
    real = []
    for name in names:
        mel = np.asarray(ds.get_mel(os.path.join(wav_dir, name)))
        real.append((mel, mel.shape[1]))
    real_tex = texture_stats(real, tex_ch)

    ckpt_path = CheckpointManager(out).latest()
    if iteration is None:
        iteration = int(os.path.basename(ckpt_path)
                        .split("iter=")[1].split("_")[0])
    model, variables = load_generator(ckpt_path, hp)
    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)[None]

    # --- Identification: the (N styles) x (M dropout keys) grid on the
    # MODE band — the same methodology as scripts/mode_attribution.py.
    from gantron_tpu.eval.mode_study import hiband_level

    N, M = args.n_styles, args.n_dropout
    text_batch = jnp.broadcast_to(jnp.asarray(seq), (N, seq.shape[1]))
    key = jax.random.PRNGKey(100 + args.seed)
    k_style, k_drop = jax.random.split(key)
    styles = jax.random.uniform(k_style, (N, 1, hp.noise_size))
    infer = jax.jit(lambda v, text, style, kd, kn: model.apply(
        v, text, style, None, None, hp.max_decoder_steps,
        method=model.infer, rngs={"dropout": kd, "noise": kn}))
    levels = np.zeros((N, M))
    for j in range(M):
        kd = jax.random.fold_in(k_drop, j)
        grid_out = infer(variables, text_batch, styles, kd,
                         jax.random.fold_in(kd, 999))
        mels = np.asarray(grid_out[1])
        lens = np.asarray(grid_out[4])
        for i in range(N):
            m = mels[i, :, : max(int(lens[i]), 2)]
            levels[i, j] = hiband_level(m, mode_ch)
    attribution = attribution_grid_stats(levels, anchors["midpoint"])

    # --- Texture: free-running samples (independent noise draws) scored on
    # the TEXTURE band, same methodology as scripts/gan_texture_study.py.
    smels, slengths = random_style(
        model, variables, jnp.asarray(seq), hp.noise_size,
        args.samples, max_decoder_steps=hp.max_decoder_steps,
        key=jax.random.PRNGKey(7 + args.seed))
    gen_tex = texture_stats(
        [(smels[i], slengths[i]) for i in range(smels.shape[0])], tex_ch)

    result = {
        "variant": args.variant,
        "hparams": {k: v for k, v in VARIANTS[args.variant].items()},
        "hparams_override": args.hparams,
        "iterations": iteration,
        "train_seconds": train_seconds,
        "seed": args.seed,
        "final_validation": final_val,
        "mode_anchors": anchors,
        "identification": attribution,
        "texture_real": real_tex,
        "texture_generated": gen_tex,
        "texture_recovery": round(
            gen_tex["temporal_std"] / max(real_tex["temporal_std"], 1e-9),
            4),
        "n_utts": args.n_utts,
        "analyze_only": args.analyze_only,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out, "composed_study.json"), "w") as f:
        json.dump(result, f, indent=2)
    brief = {k: v for k, v in result.items()
             if k not in ("identification", "texture_real",
                          "texture_generated", "mode_anchors")}
    brief["identification"] = {
        k: v for k, v in attribution.items()
        if k not in ("level_grid", "per_style_hi_counts")}
    brief["texture_generated_std"] = gen_tex["temporal_std"]
    brief["texture_real_std"] = real_tex["temporal_std"]
    print(json.dumps(brief, indent=2))


if __name__ == "__main__":
    main()
