#!/usr/bin/env python
"""End-to-end model study CLI (reference: study_model.py:200-229).

Steps (reference study_model.py:1-9): generate forced-style samples ->
vocode -> re-extract classifier mels -> train a classifier on group ids ->
report controllability accuracy + generation error rate.
"""

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-g", "--gantron_path", type=str, required=True)
    parser.add_argument("-w", "--waveglow_path", type=str, default=None,
                        help="WaveGlow checkpoint (Griffin-Lim if absent)")
    parser.add_argument("-o", "--output_path", type=str, required=True)
    parser.add_argument("--samples", type=int, default=10)
    parser.add_argument("--waveglow_bs", type=int, default=8)
    parser.add_argument("--hparams", type=str, required=False)
    parser.add_argument("--notes", type=str, default="")
    parser.add_argument("--speaker", default=0, type=int)
    parser.add_argument("--n_groups", default=6, type=int)
    parser.add_argument("--force_emotions", default=None, type=str)
    parser.add_argument("--predefined", default="true", type=str)
    parser.add_argument("--force_noise", default=None, type=str)
    parser.add_argument("--int_labels", action="store_true")
    parser.add_argument("--classifier_epochs", type=int, default=100)
    parser.add_argument("--classifier_hparams", type=str, default=None,
                        help="k=v,k=v overrides for the study classifier "
                             "(e.g. n_frames=24 for short corpora)")
    parser.add_argument("--text", type=str,
                        default="Emotional speech synthesis")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    def str2bool(v):
        if v is None:
            return None
        return str(v).lower() in ("yes", "true", "t", "y", "1")

    from gantron_tpu.config import ClassifierHParams, HParams
    from gantron_tpu.eval.study import study_model
    from gantron_tpu.utils.loading import load_generator

    os.makedirs(args.output_path, exist_ok=True)
    hp = HParams.create(args.hparams)
    hp.add_params(args)
    if not hp.use_noise:
        hp.noise_size = 0

    model, variables = load_generator(args.gantron_path, hp)
    waveglow = None
    if args.waveglow_path:
        from gantron_tpu.models.waveglow import load_waveglow

        waveglow = load_waveglow(args.waveglow_path)

    metrics = study_model(
        args.output_path, model, variables, hp, text=args.text,
        n_groups=args.n_groups, samples=args.samples,
        predefined=str2bool(args.predefined),
        force_emotions=str2bool(args.force_emotions),
        force_noise=str2bool(args.force_noise), int_labels=args.int_labels,
        waveglow=waveglow, classifier_epochs=args.classifier_epochs,
        seed=args.seed, log_fn=lambda r: print(r), speaker=args.speaker,
        waveglow_bs=args.waveglow_bs,
        classifier_hp=(ClassifierHParams.create(args.classifier_hparams)
                       if args.classifier_hparams else None))

    print(json.dumps({k: v for k, v in metrics.items() if k != "history"},
                     indent=2))
    with open(os.path.join(args.output_path, "study_metrics.json"),
              "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
