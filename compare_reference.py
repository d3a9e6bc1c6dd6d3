#!/usr/bin/env python
"""Mel-MAE comparison harness against the PyTorch reference
(BASELINE metric "mel MAE vs ref").

Two modes:
  1. ``--reference_ckpt ref.ckpt``: convert the reference checkpoint's
     generator weights (utils/torch_compat) and run OUR teacher-forced
     forward on a deterministic synthetic batch, writing outputs to
     ``--out outputs.npz``. Running the reference implementation on the same
     batch elsewhere and passing its outputs via ``--reference_outputs``
     yields the MAE.
  2. ``--reference_outputs ref_out.npz``: compare previously dumped outputs
     (keys: mel, mel_postnet, gate, alignments) against ours; prints one
     JSON line with the MAEs.

The deterministic batch (seeded by --seed) is reproducible on both sides;
dropout is disabled for comparability (prenet dropout is the reference's
always-on quirk — disable it there too when dumping reference outputs).
"""

import argparse
import json

import numpy as np


def synth_inputs(hp, B=2, T_in=48, T_out=120, seed=1234):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, hp.n_symbols, (B, T_in)).astype(np.int32)
    text_lengths = np.full((B,), T_in, np.int32)
    mels = (rng.randn(B, hp.n_mel_channels, T_out) * 1.5 - 6).astype(
        np.float32)
    output_lengths = np.full((B,), T_out, np.int32)
    return text, text_lengths, mels, output_lengths


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference_ckpt", type=str, default=None,
                        help="reference torch .ckpt to convert and run")
    parser.add_argument("--reference_outputs", type=str, default=None,
                        help=".npz of reference outputs to compare against")
    parser.add_argument("--out", type=str, default="our_outputs.npz")
    parser.add_argument("--hparams", type=str, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    # Prenet dropout is always-on in both models; comparisons default to
    # disabling it on both sides (deterministic). --with_dropout keeps it.
    parser.add_argument("--with_dropout", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import gantron_tpu.models.tacotron2 as taco_mod
    from gantron_tpu.config import HParams
    from gantron_tpu.models import Tacotron2

    hp = HParams.create(args.hparams)
    if not hp.use_noise:
        hp.noise_size = 0

    text, text_lengths, mels, output_lengths = synth_inputs(
        hp, seed=args.seed)

    model = Tacotron2(hp)
    if args.reference_ckpt:
        from gantron_tpu.utils.torch_compat import load_reference_checkpoint

        params, batch_stats = load_reference_checkpoint(args.reference_ckpt,
                                                        hp)
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "noise": jax.random.PRNGKey(2)},
            jnp.asarray(text), jnp.asarray(text_lengths), jnp.asarray(mels),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 5)),
            jnp.asarray(output_lengths), train=False)

    if not args.with_dropout:
        taco_mod._dropout = lambda x, r, k: x  # deterministic comparison

    out = model.apply(
        variables, jnp.asarray(text), jnp.asarray(text_lengths),
        jnp.asarray(mels), jnp.zeros((2,), jnp.int32), jnp.zeros((2, 5)),
        jnp.asarray(output_lengths), train=False,
        rngs={"dropout": jax.random.PRNGKey(3),
              "noise": jax.random.PRNGKey(4)})

    ours = {"mel": np.asarray(out[0]), "mel_postnet": np.asarray(out[1]),
            "gate": np.asarray(out[2]), "alignments": np.asarray(out[3]),
            "text": text, "mels_in": mels}
    np.savez(args.out, **ours)

    result = {"outputs": args.out}
    if args.reference_outputs:
        ref = np.load(args.reference_outputs)
        for key in ("mel", "mel_postnet", "gate", "alignments"):
            if key in ref:
                result[f"mae_{key}"] = float(
                    np.abs(ours[key] - ref[key]).mean())
        result["metric"] = "mel MAE vs reference"
        result["value"] = result.get("mae_mel_postnet",
                                     result.get("mae_mel"))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
