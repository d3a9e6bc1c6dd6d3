#!/usr/bin/env python
"""Per-frame sharpness study: does the adversarial loss buy TEXTURE where
MSE must blur?

The round-3 mode study measured mode SELECTION (a global hidden bit); GAN
on/off came out neutral there because that corpus's emotion->spectrum map is
near-deterministic. This study targets the other half of the GAN value
proposition (reference train.py:291-424's design intent): on
``data.toy.build_texture_corpus`` the high-band amplitude is redrawn i.i.d.
EVERY mel frame — unpredictable from text and all history — so the
MSE-optimal free-running generator outputs the flat conditional mean
(within-utterance high-band temporal std ~0) while the real corpus has a
large, known spread. Train d_freq=0 / d_freq=1 / rollout with identical
architecture and score free-running samples with
``gantron_tpu.eval.mode_study.texture_stats`` against the real-corpus
anchor.

Usage: python scripts/gan_texture_study.py --variant gan -o /tmp/texstudy
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "gan": {},
    "nogan": {"d_freq": 0, "disc_warmp_up": 0},
    "rollout": {"adversarial_rollouts": True},
    # Round-4 extension arms: D-side knobs the reference ships but never
    # measures (hparams.py:93-102), each asked "does it recover more of the
    # unpredictable per-frame texture?".
    # WGAN-GP (reference train.py:32-69, off by default) instead of the
    # 0.001 weight clip — a much softer Lipschitz constraint, so D keeps
    # more capacity to see texture statistics.
    "gp": {"gradient_penalty_lambda": 10.0},
    "gp_rollout": {"gradient_penalty_lambda": 10.0,
                   "adversarial_rollouts": True},
    # The reference's second discriminator family (model.py:543-583).
    "lindisc": {"discriminator_type": "linear"},
    # Finer windows: 10-frame scores give D ~2x more views per utterance of
    # the per-frame statistic.
    "win10": {"discriminator_window": 10},
    # Twice the D steps per G/D cycle.
    "gan_d2": {"d_freq": 2},
}

STUDY_TEXT = "aeioumnst"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", choices=sorted(VARIANTS), default="gan")
    parser.add_argument("-o", "--output", default="/tmp/texstudy")
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--n_utts", type=int, default=200)
    parser.add_argument("--samples", type=int, default=40,
                        help="free-running samples (independent noise draws)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hparams", type=str, default=None)
    parser.add_argument("--analyze_only", action="store_true")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from gantron_tpu.config import HParams
    from gantron_tpu.data.dataset import TextMelDataset
    from gantron_tpu.data.toy import build_texture_corpus
    from gantron_tpu.eval.mode_study import hiband_channels, texture_stats
    from gantron_tpu.eval.sampling import random_style
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.loading import load_generator
    from gantron_tpu.utils.logging import MetricLogger

    from _study_common import final_validation, small_model_params

    corpus_root = os.path.join(args.output, f"corpus{args.seed}"
                               if args.seed else "corpus")
    os.makedirs(corpus_root, exist_ok=True)
    wav_dir, train_list, val_list = build_texture_corpus(
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

    # Real-corpus anchor via the SAME mel extraction the model trained on.
    ds = TextMelDataset(hp.training_files, hp, wav_dir)
    channels = hiband_channels(hp)
    with open(train_list) as f:
        names = [line.split("|")[0] for line in f if line.strip()]
    real = []
    for name in names:
        mel = np.asarray(ds.get_mel(os.path.join(wav_dir, name)))
        real.append((mel, mel.shape[1]))
    real_stats = texture_stats(real, channels)

    ckpt_path = CheckpointManager(out).latest()
    if iteration is None:
        iteration = int(os.path.basename(ckpt_path)
                        .split("iter=")[1].split("_")[0])
    model, variables = load_generator(ckpt_path, hp)
    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)[None]
    mels, lengths = random_style(
        model, variables, jax.numpy.asarray(seq), hp.noise_size,
        args.samples, max_decoder_steps=hp.max_decoder_steps,
        key=jax.random.PRNGKey(7 + args.seed))
    gen = [(mels[i], lengths[i]) for i in range(mels.shape[0])]
    gen_stats = texture_stats(gen, channels)

    result = {
        "variant": args.variant,
        "hparams": dict(VARIANTS[args.variant]),
        "hparams_override": args.hparams,
        "iterations": iteration,
        "train_seconds": train_seconds,
        "final_validation": final_val,
        "real": real_stats,
        "generated": gen_stats,
        # The headline: fraction of the real within-utterance texture spread
        # the generator reproduces (1.0 = real-like, ~0 = MSE-flat).
        "texture_recovery": round(
            gen_stats["temporal_std"] / max(real_stats["temporal_std"],
                                            1e-9), 4),
        "n_utts": args.n_utts,
        "seed": args.seed,
        "analyze_only": args.analyze_only,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out, "texture_study.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
