#!/usr/bin/env python
"""Trained-checkpoint controllability evidence: train one variant of a small
GANtron on the emotive tone corpus, then run the FULL study_model pipeline
(generate forced-emotion groups -> Griffin-Lim vocode -> re-extract
classifier mels -> train a fresh group classifier) on the resulting
checkpoint and record group-classification accuracy + generation error rate
(the reference's headline controllability metrics, study_model.py:142-197).

Variants:
  gan    d_freq=1 (adversarial training on)      -- the main evidence run
  nogan  d_freq=0 (plain Tacotron2-style)        -- GAN on/off comparison
  k2/k4  n_frames_per_step=2/4 + GAN             -- K quality/throughput study

Each variant writes <out>/<variant>/evidence.json. Usage:
  python scripts/evidence_run.py --variant gan -o /tmp/evidence
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "gan": {},
    "nogan": {"d_freq": 0, "disc_warmp_up": 0},
    "k2": {"n_frames_per_step": 2},
    "k4": {"n_frames_per_step": 4},
    # The reference's "Full GANtron" shape (labels + noise, README.md:26-33)
    # composed with the round-4 identification stack that the mode study
    # validated (gan_mode_study.py infogan_bit_warm). The question this arm
    # measures: do the emotion-controllability gates (study acc / GER /
    # kmeans / alignment) survive an IDENTIFIED latent riding alongside the
    # label conditioning?
    "full_identified": {"use_noise": True, "noise_size": 32,
                        "adversarial_rollouts": True,
                        "style_reconstruction_weight": 10.0,
                        "diversity_weight": 1.0, "diversity_cap": 0.9,
                        "style_code_dims": 1, "style_code_levels": 2,
                        "identification_warmup": 1000},
}

STUDY_TEXT = "aeioumnst"  # toy-alphabet sentence for generation


def mel_sharpness(mel_dir):
    """Mean squared temporal difference of generated mels — adversarial
    training should resist the MSE-loss blur (higher = sharper)."""
    import numpy as np

    vals = []
    for p in sorted(os.listdir(mel_dir)):
        if not p.endswith(".npy"):
            continue
        m = np.load(os.path.join(mel_dir, p), allow_pickle=True)
        if m.ndim == 3:
            m = m[0]
        if m.shape[1] >= 2:
            vals.append(float(np.mean(np.diff(m, axis=1) ** 2)))
    return float(sum(vals) / max(len(vals), 1))


def kmeans_on_study(mel_dir):
    """Unsupervised separability of the study's generated mels (reference
    check_kmeans.py, via eval.clustering): group id parsed from the
    ``{g}-{i}-...`` simple_name files, same featurization as the reference
    loader (common-length prefix, flattened, max-normalized)."""
    import numpy as np

    from gantron_tpu.eval.clustering import check_kmeans_accuracy

    mels, gids = [], []
    for p in sorted(os.listdir(mel_dir)):
        if not p.endswith(".npy"):
            continue
        m = np.load(os.path.join(mel_dir, p), allow_pickle=True)
        if m.ndim == 3:
            m = m[0]
        mels.append(m)
        gids.append(int(p.split("-")[0]))
    min_len = min(m.shape[1] for m in mels)
    max_val = max(max(abs(float(m.min())), abs(float(m.max())))
                  for m in mels)
    rows = np.stack([m[:, :min_len].flatten() / max_val for m in mels])
    basic, best, perm = check_kmeans_accuracy(rows, np.asarray(gids))
    return {"basic_accuracy": round(basic, 4),
            "best_accuracy": round(best, 4),
            "n_samples": len(gids), "n_frames": int(min_len)}


def alignment_check(model, variables, hp, text, n_groups, batch=8, seed=1):
    """Attention-alignment quality of open-loop decoding, per forced-emotion
    group: focus (mean max attention weight per frame), monotonicity
    (fraction of frames whose argmax does not move backward), and coverage
    (fraction of text positions that win at least one frame's argmax).
    A model whose alignment collapsed fails all three; the reference only
    eyeballs this via plot_alignment (plotting_utils.py), here it is a
    number the K decision can cite."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from gantron_tpu.eval.sampling import INT_EMOTIONS
    from gantron_tpu.text import text_to_sequence

    seq = jnp.asarray(np.asarray(
        text_to_sequence(text, ["english_cleaners"]), np.int32)[None])
    seq = jnp.broadcast_to(seq, (batch, seq.shape[1]))
    spk = jnp.zeros((batch,), jnp.int32)
    focus, mono, cover = [], [], []
    for g in range(n_groups):
        emo = jnp.broadcast_to(jnp.asarray(INT_EMOTIONS[g]), (batch, 5))
        out = model.apply(
            variables, seq, None, emo, spk, hp.max_decoder_steps,
            method=model.infer,
            rngs={"dropout": jax.random.PRNGKey(seed + 2 * g),
                  "noise": jax.random.PRNGKey(seed + 2 * g + 1)})
        align = np.asarray(out[3])   # (B, S, T_in) — one row per scan STEP
        lengths = np.asarray(out[4])
        T = align.shape[2]
        # Decoder.infer returns frame-level lengths (= steps * K); the
        # alignment matrix has one row per scan step, so slice in STEP
        # units — otherwise every K>1 sample's metrics would include
        # post-gate-stop attention rows (parked on one position) and the
        # K=1 vs K=2 comparison would be apples-to-oranges.
        K = int(getattr(hp, "n_frames_per_step", 1) or 1)
        for i in range(batch):
            L = max(-(-int(lengths[i]) // K), 1)
            a = align[i, :L]
            arg = a.argmax(axis=1)
            focus.append(float(a.max(axis=1).mean()))
            mono.append(float(np.mean(np.diff(arg) >= 0)) if L > 1 else 1.0)
            cover.append(len(set(arg.tolist())) / T)
    return {"focus": round(float(np.mean(focus)), 4),
            "monotonicity": round(float(np.mean(mono)), 4),
            "coverage": round(float(np.mean(cover)), 4),
            "n": len(focus)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", choices=sorted(VARIANTS), default="gan")
    parser.add_argument("-o", "--output", default="/tmp/evidence")
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--n_utts", type=int, default=300)
    parser.add_argument("--samples", type=int, default=20,
                        help="study samples per emotion group")
    parser.add_argument("--classifier_epochs", type=int, default=40)
    parser.add_argument("--hparams", type=str, default=None)
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from gantron_tpu.config import ClassifierHParams, HParams
    from gantron_tpu.data.toy import build_emotive_corpus
    from gantron_tpu.eval.study import study_model
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.loading import load_generator
    from gantron_tpu.utils.logging import MetricLogger

    # Corpus is shared across variants (same seed -> same wavs/filelists).
    corpus_root = os.path.join(args.output, "corpus")
    os.makedirs(corpus_root, exist_ok=True)
    vesus_root, lj_empty, train_list, val_list = build_emotive_corpus(
        corpus_root, n_utts=args.n_utts)

    from _study_common import final_validation, small_model_params

    hp = HParams()
    hp.add_params(small_model_params(args.iterations))
    hp.add_params(dict(
        speakers_embedding=16, n_labels=5,
        use_noise=False, noise_size=0,
        use_labels=True, use_intended_labels=True, vesus_path=vesus_root,
        training_files=[lj_empty, train_list],
        validation_files=[lj_empty, val_list],
    ))
    hp.add_params(VARIANTS[args.variant])
    if args.hparams:
        hp.add_params_string(args.hparams)

    out = os.path.join(args.output, args.variant)
    logger = MetricLogger(out, run_name=args.variant)
    t0 = time.time()
    state, iteration = train(out, None, False, hp, corpus_root + os.sep,
                             logger=logger)
    train_seconds = time.time() - t0
    steps_per_sec = iteration / max(train_seconds, 1e-9)

    final_val = final_validation(
        os.path.join(out, f"{args.variant}.metrics.jsonl"))

    # Study on the trained checkpoint: forced one-hot emotion groups
    # (int_labels), no noise forcing (use_noise=False in these variants).
    ckpt_path = CheckpointManager(out).latest()
    model, variables = load_generator(ckpt_path, hp)
    study_dir = os.path.join(out, "study")
    hpc = ClassifierHParams()
    # Toy utterances are ~30-54 frames; crop within them.
    hpc.add_params(dict(n_frames=24, batch_size=16))
    study = study_model(
        study_dir, model, variables, hp, text=STUDY_TEXT, n_groups=5,
        samples=args.samples, int_labels=True, predefined=False,
        force_emotions=True, force_noise=False,
        classifier_epochs=args.classifier_epochs, seed=0,
        log_fn=lambda r: logger.info(str(r)), classifier_hp=hpc)
    study.pop("history", None)

    # Round-4 additions (verdict r3 ask #6): the K decision cites the
    # classifier study AND an unsupervised k-means split AND alignment
    # quality, all on the same trained checkpoint.
    kmeans = kmeans_on_study(os.path.join(study_dir, "GANtronInference"))
    alignment = alignment_check(model, variables, hp, STUDY_TEXT,
                                n_groups=5)

    result = {
        "variant": args.variant,
        "hparams": {k: v for k, v in VARIANTS[args.variant].items()},
        "iterations": iteration,
        "train_seconds": round(train_seconds, 1),
        "train_steps_per_sec": round(steps_per_sec, 2),
        "final_validation": final_val,
        "study": study,
        "check_kmeans": kmeans,
        "alignment": alignment,
        "generated_mel_sharpness": mel_sharpness(
            os.path.join(study_dir, "GANtronInference")),
        "n_utts": args.n_utts,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out, "evidence.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
