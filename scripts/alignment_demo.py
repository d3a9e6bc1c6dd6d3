#!/usr/bin/env python
"""Attention-alignment emergence demo on real wav files.

Trains a small GANtron on the toy tone-language corpus (each character is a
distinct tone, so the ground-truth alignment is a clean diagonal) through
the FULL pipeline — wav decode -> mel cache -> bucketed batches -> jitted
G/D loop — and saves alignment plots at each checkpoint. The final plot is
committed at docs/alignment_demo.png as training evidence
(reference behavior this mirrors: train.py:211-440 validation plots,
logger.py:17-26).

Usage: JAX_PLATFORMS=cpu python scripts/alignment_demo.py -o /tmp/align_demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default="/tmp/align_demo")
    parser.add_argument("--iterations", type=int, default=400)
    parser.add_argument("--n_utts", type=int, default=64)
    parser.add_argument("--hparams", type=str, default=None,
                        help="extra k=v,k=v overrides (e.g. "
                             "n_frames_per_step=2 or fp16_run=True)")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from gantron_tpu.config import HParams
    from gantron_tpu.data.toy import build_corpus
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.logging import MetricLogger

    corpus_root = os.path.join(args.output, "corpus")
    os.makedirs(corpus_root, exist_ok=True)
    wav_dir, train_list, val_list = build_corpus(
        corpus_root, n_utts=args.n_utts, n_train=args.n_utts - 8,
        min_chars=5, max_chars=9)

    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=64, encoder_embedding_dim=64,
        encoder_n_convolutions=2, attention_rnn_dim=96, decoder_rnn_dim=96,
        prenet_dim=32, attention_dim=32, attention_location_n_filters=8,
        attention_location_kernel_size=15, postnet_embedding_dim=64,
        postnet_n_convolutions=3, noise_size=16, discriminator_dim=64,
        max_decoder_steps=60, use_noise=True, use_labels=False,
        scan_unroll=1, mesh_shape=[1], validation_audio=False,
        batch_size=8, iterations=args.iterations,
        iters_per_checkpoint=max(args.iterations // 4, 1),
        disc_warmp_up=40, attn_steps=args.iterations,  # guide loss all run
        g_learning_rate=2e-3, d_learning_rate=7e-4,
        text_buckets=[12], mel_buckets=[60],
        training_files=[train_list], validation_files=[val_list],
    ))
    if args.hparams:
        hp.add_params_string(args.hparams)

    out = os.path.join(args.output, "run")
    logger = MetricLogger(out, run_name="align")
    train(out, None, False, hp, wav_dir, logger=logger)
    print(f"\nDone. Alignment plots in {out}/media/")


if __name__ == "__main__":
    main()
