#!/usr/bin/env python
"""Classifier inference CLI (reference: inference_classifier.py:82-108).

Predicts emotions for a wav file or a folder (SAVEE / CREMA-D labels decoded
from filenames for accuracy reporting).
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--classifier_path", type=str, required=True,
                        help="classifier checkpoint (orbax dir saved by "
                             "ClassifierTrainer.save)")
    parser.add_argument("--path", type=str, required=True)
    parser.add_argument("--hparams", type=str)
    parser.add_argument("--sr", type=int, default=22050)
    parser.add_argument("--inference_folder", action="store_true")
    parser.add_argument("--dataset", type=str,
                        help="SAVEE or CREMA-D (for folder accuracy)")
    args = parser.parse_args()

    from gantron_tpu.eval.classifier import ClassifierTrainer
    from gantron_tpu.eval.inference_classifier import (inference_folder,
                                                       inference_from_path)

    trainer = ClassifierTrainer.load(args.classifier_path)
    hp = trainer.hp
    if args.hparams:
        hp.add_params(args.hparams)
    model = trainer.model
    variables = trainer.variables

    if args.inference_folder:
        inference_folder(model, variables, args.path, args.dataset, hp,
                         args.sr)
    else:
        _, emotion = inference_from_path(model, variables, args.path, hp,
                                         args.sr)
        print(f"Inferred emotion for {args.path} is: {emotion}")


if __name__ == "__main__":
    main()
