#!/usr/bin/env python
"""Noise-vs-dropout mode attribution on a trained mode-study checkpoint.

A free-running GANtron sample has TWO randomness sources: the injected
noise/style vector (the designed latent, reference model.py:184-191,
273-279) and the always-on prenet dropout (reference model.py:104). The
mode-commitment study (scripts/gan_mode_study.py) scores diversity across
full samples, which draws BOTH — so diversity alone cannot tell whether the
latent controls the output mode or the decoder is flipping a coin in its
dropout masks.

This instrument separates them on an existing checkpoint: an N x M grid of
(noise style i, dropout key j) decodes of the same text. ``style`` is
injected deterministically (Tacotron2.infer(style=...) bypasses the noise
rng), so along j only dropout varies and along i only the latent varies.

  * within_noise_consistency: mean over styles of the majority-mode fraction
    across the M dropout draws. 1.0 = the latent fully determines the mode;
    the chance floor is max(frac_hi, 1-frac_hi) of the grid.
  * noise_mode_split: per-style majority modes — how many of the N latents
    map to each mode (latent-driven diversity).
  * flip contrast: holding ONE dropout key and varying styles vs holding one
    style and varying dropout keys.

Usage:
  python scripts/mode_attribution.py --run_dir /tmp/modestudy/gan_s1 \
      --variant gan --iterations 3000 [--n_styles 16 --n_dropout 8]
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
    parser.add_argument("--run_dir", required=True,
                        help="a gan_mode_study output dir (checkpoint + "
                             "mode_study.json with real_anchors)")
    # Any study variant: they share the inference architecture (the variant
    # overrides only touch the training schedule), but recording the true
    # variant keeps the artifact's provenance straight.
    # Choices come from the single source of truth so a new study variant
    # (e.g. infogan_sat) is probe-able the moment it exists — a stale
    # hard-coded tuple silently dropped the round-4 sat attributions once.
    from gan_mode_study import VARIANTS as _VARIANTS

    parser.add_argument("--variant", default="gan",
                        choices=tuple(sorted(_VARIANTS)))
    parser.add_argument("--iterations", type=int, default=3000,
                        help="must match the training run (schedule-derived "
                             "hparams feed the model config)")
    parser.add_argument("--n_styles", type=int, default=16)
    parser.add_argument("--n_dropout", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hparams", type=str, default=None,
                        help="must repeat any --hparams the training run "
                             "used (e.g. n_frames_per_step=2): the "
                             "checkpoint template is built from this config")
    parser.add_argument("--cpu", action="store_true",
                        help="pin the CPU backend (the axon site hook "
                             "re-sets JAX_PLATFORMS)")
    parser.add_argument("--probe", action="store_true",
                        help="mid-run probe of a LIVE training run: score "
                             "the newest periodic checkpoint and write "
                             "mode_attribution_probe_<iter>.json instead of "
                             "the final artifact (safe alongside training; "
                             "anchors are recomputed from the corpus when "
                             "mode_study.json does not exist yet)")
    parser.add_argument("--n_utts", type=int, default=200,
                        help="corpus size for the anchor recomputation "
                             "fallback (must match the training run)")
    parser.add_argument("--select", choices=("latest", "best"),
                        default="latest",
                        help="'best' scores the checkpoint keep-best "
                             "retention preserved (lowest val loss on "
                             "disk) — the one a deployment would load — "
                             "instead of the run's endpoint")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from _study_common import small_model_params
    from gan_mode_study import VARIANTS
    from gantron_tpu.config import HParams
    from gantron_tpu.eval.mode_study import hiband_channels
    from gantron_tpu.eval.sampling import attribution_level_grid
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.utils.loading import load_generator

    hp = HParams()
    hp.add_params(small_model_params(args.iterations))
    hp.add_params(dict(use_noise=True, noise_size=32, use_labels=False))
    hp.add_params(VARIANTS[args.variant])
    if args.hparams:
        hp.add_params_string(args.hparams)

    study_json = os.path.join(args.run_dir, "mode_study.json")
    if os.path.exists(study_json):
        with open(study_json) as f:
            study = json.load(f)
        anchors = study["real_anchors"]
    else:
        # Mid-run probe before gan_mode_study has written its artifact:
        # recompute the real-mode anchors from the (deterministic, seeded)
        # corpus via the shared helper — same extraction the run trains on.
        # build_bimodal_corpus is read-safe next to a live run: existing
        # wavs are never rewritten (toy.py _emit_wav) and filelist writes
        # are atomic; it is re-invoked here only to reconstruct the seeded
        # ``modes`` map.
        from gantron_tpu.data.toy import build_bimodal_corpus
        from gantron_tpu.eval.mode_study import compute_real_anchors

        corpus_root = os.path.join(
            os.path.dirname(os.path.abspath(args.run_dir)),
            f"corpus{args.seed}" if args.seed else "corpus")
        wav_dir, train_list, _, modes = build_bimodal_corpus(
            corpus_root, n_utts=args.n_utts, seed=args.seed)
        anchors = compute_real_anchors(train_list, wav_dir, modes, hp)
    midpoint = anchors["midpoint"]

    manager = CheckpointManager(args.run_dir)
    ckpt_path = manager.best() if args.select == "best" else manager.latest()
    model, variables = load_generator(ckpt_path, hp)
    channels = hiband_channels(hp)

    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)[None]
    levels = attribution_level_grid(
        model, variables, hp, seq, channels,
        n_styles=args.n_styles, n_dropout=args.n_dropout, seed=args.seed)

    from gantron_tpu.eval.mode_study import attribution_grid_stats

    result = {
        "run_dir": args.run_dir,
        "variant": args.variant,
        "hparams_override": args.hparams,
        "checkpoint": os.path.basename(ckpt_path),
        "selection": args.select,
        **attribution_grid_stats(levels, midpoint),
        "anchors": anchors,
        "device": str(jax.devices()[0]),
    }
    name = ("mode_attribution.json" if args.select == "latest"
            else "mode_attribution_best.json")
    if args.probe:
        it = os.path.basename(ckpt_path).split("iter=")[1].split("_")[0]
        result["probe_iteration"] = int(it)
        name = f"mode_attribution_probe_{it}.json"
    out_path = os.path.join(args.run_dir, name)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("level_grid", "per_style_hi_counts")},
                     indent=2))


if __name__ == "__main__":
    main()
