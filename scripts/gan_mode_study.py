#!/usr/bin/env python
"""One-to-many mode-commitment study: does the adversarial loss + injected
noise let the generator COMMIT to a mode where MSE regresses to the mean?

This is the learning-dynamics evidence for the one design element that makes
GANtron a GAN (reference model.py:184-191, 273-279; train.py:291-424): on
``build_bimodal_corpus`` each utterance randomly carries (mode hi) or lacks
(mode lo) a >=5 kHz noise texture hidden from text/labels, so p(mel | text)
is bimodal. The MSE-optimal free-running generator outputs the blurred
conditional mean between the modes; a working GAN uses its noise vector to
land on a real mode per draw. We train d_freq=1 vs d_freq=0 with identical
architecture (noise path present in both) and score free-running samples
with ``gantron_tpu.eval.mode_study``.

Usage: python scripts/gan_mode_study.py --variant gan -o /tmp/modestudy
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
    # Free-running adversarial rollouts: D scores (and trains against) the
    # open-loop sampling distribution instead of teacher-forced outputs —
    # the lever the mode-attribution study motivates (the teacher-forced GAN
    # leaves the latent unused; see docs/TRAINING_EVIDENCE.md).
    "rollout": {"adversarial_rollouts": True},
    # Rollouts + InfoGAN-style latent identification: a StyleEncoder head
    # reconstructs the injected style from the rollout mel and the error
    # joins the G loss — the mechanism that makes the latent the mode
    # carrier, which adversarial pressure alone never does (round-3 study).
    "infogan": {"adversarial_rollouts": True,
                "style_reconstruction_weight": 10.0},
    # Q head + diversity-sensitive regularizer (config.py diversity_weight):
    # the Q head alone sits at a cold-start saddle (measured: its recon loss
    # never left the uniform prior's 1/12 floor over 3000 iters — the flat Q
    # passes zero gradient to a style-invariant G); the DS term's gradient
    # is nonzero exactly there, pushing d(mel)/d(style) != 0 for Q to
    # organize.
    "infogan_ds": {"adversarial_rollouts": True,
                   "style_reconstruction_weight": 10.0,
                   "diversity_weight": 1.0},
    # 2-dim InfoGAN code + RATIO-clamped diversity (tau=3). MEASURED FAILURE
    # (2 chip seeds, round 4): the ratio clamp is per unit CODE distance, so
    # large code redraws keep paying until d_out = tau*d_z — far past a mode
    # flip — and G "watermarks" (all 80 samples off-manifold, frac_near_mode
    # 0.0, val mel 0.87/0.56 vs ~0.25 baseline). Kept as the measured
    # ablation arm for infogan_sat below.
    "infogan_code": {"adversarial_rollouts": True,
                     "style_reconstruction_weight": 10.0,
                     "diversity_weight": 0.5,
                     "diversity_tau": 3.0,
                     "style_code_dims": 2},
    # The designed fix for ALL three failures above: 2-dim code (pressure
    # concentrated, not diluted over 32 dims — vs infogan's saddle),
    # diversity contrasting ONLY code redraws (nuisance + dropout shared),
    # and the reward saturating in OUTPUT units (config.py diversity_cap):
    # min(d_out, 0.9)/0.9 — the cap sits between the corpus's measured
    # within-mode jitter (0.28 mel-L1, same text, fresh noise) and its
    # cross-mode flip distance (1.05), so a real mode flip earns the full
    # reward and off-manifold spread past it earns NOTHING (vs infogan_ds /
    # infogan_code, where unsaturated spread swamped fidelity).
    "infogan_sat": {"adversarial_rollouts": True,
                    "style_reconstruction_weight": 10.0,
                    "diversity_weight": 1.0,
                    "diversity_cap": 0.9,
                    "style_code_dims": 2},
    # infogan_sat + identification warm-up (config.py identification_
    # warmup): the sat arm identified on-manifold on seed 0 (chi2 164.5,
    # p < 1e-6) but raced D off-manifold on seeds 1-2, while the pure
    # rollout arm is measured stable on 3/3 seeds (frac_near_mode 1.0).
    # So: run the first third as exactly that stable rollout GAN, then
    # switch the Q head + saturating diversity on against an anchored
    # manifold. Same compiled graph (the warm-up is a traced 0/1 scale).
    "infogan_warm": {"adversarial_rollouts": True,
                     "style_reconstruction_weight": 10.0,
                     "diversity_weight": 1.0,
                     "diversity_cap": 0.9,
                     "style_code_dims": 2,
                     "identification_warmup": 1000},
    # The structural fix the sat/warm failures point at (measured: sat 2/3
    # seeds and warm 1/1 watermark even with the saturating cap): a
    # CONTINUOUS code can only beat the Q head's uniform-prior floor if the
    # mel carries continuous code information, and this corpus's real latent
    # factor is BINARY — so continuous identification pressure structurally
    # demands an off-manifold continuous carrier. A 2-level discrete code
    # (config.py style_code_levels; classic InfoGAN categorical form) is
    # exactly satisfiable by flipping real modes: recon MSE -> 0 on-manifold,
    # zero residual watermark pressure. Diversity redraw flips the level, so
    # every pair carries contrast.
    "infogan_bit": {"adversarial_rollouts": True,
                    "style_reconstruction_weight": 10.0,
                    "diversity_weight": 1.0,
                    "diversity_cap": 0.9,
                    "style_code_dims": 1,
                    "style_code_levels": 2},
    # The two fixes composed. Measured separately: the discrete code removes
    # the watermark channel (bit seeds fail by COLLAPSE to one mode, never
    # off-manifold — frac_near_mode 0.84 where it identifies vs warm's 0.69)
    # at ~2x better fidelity (val mel 0.40-0.55 vs 0.63-0.65), but
    # identification-at-init still races D (1/3 seeds); the warm-up fixes
    # exactly that race (warm: 2/3 vs sat: 1/3). bit_warm = discrete code
    # + the first third as the stable pure-rollout GAN.
    "infogan_bit_warm": {"adversarial_rollouts": True,
                         "style_reconstruction_weight": 10.0,
                         "diversity_weight": 1.0,
                         "diversity_cap": 0.9,
                         "style_code_dims": 1,
                         "style_code_levels": 2,
                         "identification_warmup": 1000},
}

STUDY_TEXT = "aeioumnst"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", choices=sorted(VARIANTS), default="gan")
    parser.add_argument("-o", "--output", default="/tmp/modestudy")
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--n_utts", type=int, default=200)
    parser.add_argument("--samples", type=int, default=80,
                        help="free-running samples (independent noise draws)")
    parser.add_argument("--seed", type=int, default=0,
                        help="replication seed: shifts the corpus draw, the "
                             "training PRNG, and the sampling key together")
    parser.add_argument("--hparams", type=str, default=None)
    parser.add_argument("--analyze_only", action="store_true",
                        help="skip training: score the newest checkpoint "
                             "already in the output dir (also works on a "
                             "PARTIAL run's periodic checkpoints)")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from gantron_tpu.config import HParams
    from gantron_tpu.data.toy import build_bimodal_corpus
    from gantron_tpu.eval.mode_study import (commitment_stats,
                                             compute_real_anchors,
                                             hiband_channels, hiband_level)
    from gantron_tpu.eval.sampling import random_style
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.loading import load_generator
    from gantron_tpu.utils.logging import MetricLogger

    corpus_root = os.path.join(args.output, f"corpus{args.seed}"
                               if args.seed else "corpus")
    os.makedirs(corpus_root, exist_ok=True)
    wav_dir, train_list, val_list, modes = build_bimodal_corpus(
        corpus_root, n_utts=args.n_utts, seed=args.seed)

    from _study_common import final_validation, small_model_params

    hp = HParams()
    hp.add_params(small_model_params(args.iterations))
    hp.add_params(dict(
        use_noise=True, noise_size=32, use_labels=False,
        seed=1234 + args.seed,
        training_files=[train_list], validation_files=[val_list],
    ))
    hp.add_params(VARIANTS[args.variant])
    if args.hparams:
        hp.add_params_string(args.hparams)

    out = os.path.join(args.output, args.variant
                       + (f"_s{args.seed}" if args.seed else ""))
    if args.analyze_only:
        iteration, train_seconds = None, None  # read from the ckpt below
    else:
        logger = MetricLogger(out, run_name=args.variant)
        t0 = time.time()
        state, iteration = train(out, None, False, hp, wav_dir, logger=logger)
        train_seconds = round(time.time() - t0, 1)

    final_val = final_validation(
        os.path.join(out, f"{args.variant}.metrics.jsonl"))

    # Real-mode anchors from the training mels, via the SAME extraction the
    # dataset trained on (cached next to the wavs; shared with
    # mode_attribution.py's --probe fallback).
    anchors = compute_real_anchors(train_list, wav_dir, modes, hp)
    channels = hiband_channels(hp)

    # Free-running generation: one text, `samples` independent noise draws.
    ckpt_path = CheckpointManager(out).latest()
    if iteration is None:  # --analyze_only: iteration from the ckpt name
        iteration = int(os.path.basename(ckpt_path)
                        .split("iter=")[1].split("_")[0])
    model, variables = load_generator(ckpt_path, hp)
    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)[None]
    mels, lengths = random_style(
        model, variables, jax.numpy.asarray(seq), hp.noise_size,
        args.samples, max_decoder_steps=hp.max_decoder_steps,
        key=jax.random.PRNGKey(7 + args.seed))
    gen_levels, sharp = [], []
    for i in range(mels.shape[0]):
        m = mels[i, :, : max(int(lengths[i]), 2)]
        gen_levels.append(hiband_level(m, channels))
        sharp.append(float(np.mean(np.diff(m, axis=1) ** 2)))
    stats = commitment_stats(gen_levels, anchors)

    result = {
        "variant": args.variant,
        "hparams": dict(VARIANTS[args.variant]),
        "hparams_override": args.hparams,
        "iterations": iteration,
        "train_seconds": train_seconds,
        "final_validation": final_val,
        "real_anchors": {k: round(v, 3) for k, v in anchors.items()},
        "generated": stats,
        "generated_mel_sharpness": float(np.mean(sharp)),
        "n_utts": args.n_utts,
        "seed": args.seed,
        "analyze_only": args.analyze_only,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out, "mode_study.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
