#!/usr/bin/env python
"""GANtron-TPU training CLI — flag-compatible with the reference
(reference: train.py:469-527).

Examples:
  python train.py --wavs_path /data/LJSpeech/wavs/ \
      --hparams use_labels=False,use_noise=True
  python train.py --wavs_path synthetic --hparams iterations=50,batch_size=8

GPU-era flags (--n_gpus, --rank, --group_name) are accepted and ignored:
JAX is single-controller over the device mesh (multi-host entry is
``jax.distributed.initialize``; no per-device launcher).
"""

import argparse
import os


def build_run_name(hp) -> str:
    """(reference train.py:496-501)"""
    return (f"{'vesus' if hp.vesus_path is not None else ''}LJ-"
            f"{'encIn-' if hp.encoder_inputs else ''}"
            f"{hp.noise_size}n-"
            f"{'intended' if hp.use_intended_labels and hp.use_labels else ''}"
            f"{'labels' if hp.use_labels and hp.vesus_path else 'NOlabels'}"
            f"-{'cD' if hp.discriminator_type != 'linear' else 'lD'}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output_directory", type=str, required=False,
                        help="directory to save checkpoints")
    parser.add_argument("-c", "--checkpoint_path", type=str, default=None,
                        help="checkpoint path to resume from")
    parser.add_argument("--waveglow_path", type=str, default=None,
                        help="WaveGlow weights for validation audio")
    parser.add_argument("--vesus_path", type=str, default=None,
                        help="VESUS dataset path")
    parser.add_argument("--warm_start", action="store_true",
                        help="load generator weights only, ignore listed layers")
    parser.add_argument("--n_gpus", type=int, default=1, help="(inert on TPU)")
    parser.add_argument("--rank", type=int, default=0, help="(inert on TPU)")
    parser.add_argument("--group_name", type=str, default="group_name",
                        help="(inert on TPU)")
    parser.add_argument("--hparams", type=str, required=False,
                        help="comma separated name=value pairs")
    parser.add_argument("--wavs_path", type=str, required=True,
                        help="path to the wav files, or 'synthetic'")
    parser.add_argument("--resume", type=str, default="",
                        help="run id to resume (logging only)")
    parser.add_argument("--notes", type=str, default="", help="run notes")
    parser.add_argument("--real", type=int, default=1,
                        help="value of 'real' label for the Wasserstein loss")
    parser.add_argument("--attn_steps", type=int, required=False,
                        help="use attention-guide loss for the first N steps")
    parser.add_argument("--use_wandb", action="store_true")

    args = parser.parse_args()

    # Must run before anything touches the XLA backend: joins this process
    # into a multi-host cluster when pod/cluster env vars are set (TPU pods
    # auto-configure), no-op for single-host runs. Replaces the reference's
    # init_distributed + multiproc.py launcher (train.py:79-91).
    from gantron_tpu.parallel.distributed import initialize_multihost

    rank = initialize_multihost()

    from gantron_tpu.config import HParams
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gantron_tpu.utils.logging import MetricLogger

    hp = HParams.create(args.hparams)
    hp.add_params(args)
    if not hp.use_noise:
        hp.noise_size = 0
    if hp.d_freq == 0:
        hp.disc_warmp_up = 0

    name = build_run_name(hp)
    print(f"Run {name} started")

    output_directory = args.output_directory or os.path.join(
        "output", name)
    # Chief-only logging (reference rank-0 gating, train.py:426-431);
    # loop.train installs a quiet no-op logger on other ranks.
    logger = MetricLogger(output_directory, run_name=name,
                          use_wandb=args.use_wandb,
                          config=hp.as_dict()) if rank == 0 else None
    train(output_directory, args.checkpoint_path, args.warm_start, hp,
          args.wavs_path, logger=logger, real=float(args.real),
          waveglow_path=args.waveglow_path)


if __name__ == "__main__":
    main()
