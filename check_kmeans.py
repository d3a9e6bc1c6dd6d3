#!/usr/bin/env python
"""Unsupervised emotion-separability sanity check (reference:
check_kmeans.py): k-means over fixed-length mel prefixes of a corpus laid
out as one subdirectory per emotion, scored by the best cluster->class
permutation."""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--audio_path", type=str, required=True,
                        help="path with one subdirectory per emotion "
                             "(each holding .wav or .npy mels)")
    parser.add_argument("--n_clusters", type=int, default=None,
                        help="default: number of emotion directories")
    args = parser.parse_args()

    from gantron_tpu.audio.mel import MelSpectrogram
    from gantron_tpu.eval.clustering import (check_kmeans_accuracy,
                                             load_mels_by_emotion_dir)

    mels, class_ids, names = load_mels_by_emotion_dir(
        args.audio_path, mel_fn=MelSpectrogram())
    print(f"Loaded {len(mels)} mels across {len(names)} classes: {names}")
    basic, best, perm = check_kmeans_accuracy(mels, class_ids,
                                              args.n_clusters)
    print(f"Basic accuracy is {100 * basic:.2f} %")
    print(f"The accuracy of the classifier is {100 * best:.2f} %, "
          f"with classes {perm}")


if __name__ == "__main__":
    main()
