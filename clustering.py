#!/usr/bin/env python
"""K-means / t-SNE cluster analysis CLI (reference: clustering.py:53-127,
check_kmeans.py)."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, required=True,
                        help="folder of .npy mels (or .wav with --audio)")
    parser.add_argument("--check_clusterizations", action="store_true",
                        help="score cluster/label agreement (needs 'g-i.npy' "
                             "named files)")
    parser.add_argument("--classes_items", type=int, default=20)
    parser.add_argument("--save_path", type=str)
    parser.add_argument("--clusters", type=int, default=6)
    parser.add_argument("--n_mel_channels", type=int, default=80)
    parser.add_argument("--audio", action="store_true",
                        help="extract mels from wav files")
    parser.add_argument("-w", "--waveglow", type=str,
                        help="vocode cluster centroids to wav")
    args = parser.parse_args()

    import numpy as np

    from gantron_tpu.audio.mel import MelSpectrogram
    from gantron_tpu.eval.clustering import (check_clusterization, load_mels,
                                             run_clustering, save_tsne_plot)

    mel_fn = MelSpectrogram(n_mel_channels=args.n_mel_channels)
    mels, max_val, classes = load_mels(args.path, args.n_mel_channels,
                                       from_audio=args.audio, mel_fn=mel_fn)
    print(f"Loaded {len(mels)} mel spectrograms")

    if args.check_clusterizations:
        acc, best_classes, _ = check_clusterization(
            mels, classes, classes_items=args.classes_items)
        print(f"The accuracy of the classifier is {100 * acc:.2f} %, "
              f"with classes {best_classes}")
        return

    save_path = args.save_path or args.path
    os.makedirs(save_path, exist_ok=True)
    labels, centers, embedded = run_clustering(mels, args.clusters)
    print("K-means finished")

    if args.waveglow:
        import jax.numpy as jnp

        from gantron_tpu.data.wav import write_wav
        from gantron_tpu.models.waveglow import load_waveglow

        waveglow = load_waveglow(args.waveglow)
        for i, centroid in enumerate(centers):
            mel = centroid.reshape(args.n_mel_channels, -1) * max_val
            audio = np.asarray(waveglow.infer(jnp.asarray(mel)[None],
                                              sigma=0.666))[0]
            write_wav(os.path.join(
                save_path, f"centroid_{i + 1}-of-{args.clusters}.wav"),
                audio, 22050)
        print("Centroid wavs written")

    if embedded is not None:
        save_tsne_plot(embedded, labels,
                       os.path.join(save_path, "tsne.jpg"), args.clusters)
        print("t-SNE plot saved")


if __name__ == "__main__":
    main()
