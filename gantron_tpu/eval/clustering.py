"""K-means / t-SNE cluster analysis of generated mels
(reference: clustering.py, check_kmeans.py).

``load_mels`` flattens fixed-length mel prefixes normalized by the global
max; ``check_clusterization`` brute-forces the cluster->class permutation to
score how separable the generation groups are (check_kmeans-style sanity
metric); ``run_clustering`` returns kmeans labels + 2-D t-SNE embedding for
plotting.
"""

import itertools
import os

import numpy as np


def load_mels(base_path, n_mel_channels=80, from_audio=False, mel_fn=None):
    """Load .npy mels (or extract from .wav when ``from_audio``); returns
    (flattened matrix (N, n_mel*min_len), max_val, classes)."""
    full_mels, classes = [], []
    min_len = float("inf")
    max_val = 0.0
    for path in sorted(os.listdir(base_path)):
        full = os.path.join(base_path, path)
        if from_audio and path.endswith(".wav"):
            from gantron_tpu.data.wav import load_wav

            wav = load_wav(full)
            mel = np.asarray(mel_fn(wav[None]))[0]
        elif path.endswith(".npy"):
            mel = np.load(full, allow_pickle=True)
            if "-" in path:
                classes.append(int(path.split("-")[0]))
        else:
            continue
        if mel.ndim == 3:
            mel = mel[0]
        min_len = min(min_len, mel.shape[1])
        max_val = max(max_val, abs(float(mel.min())), abs(float(mel.max())))
        full_mels.append(mel)

    if not full_mels:
        return np.zeros((0, 0)), 0.0, []
    min_len = int(min_len)
    mels = np.stack([m[:, :min_len].flatten() / max_val for m in full_mels])
    if classes:
        assert len(classes) == len(full_mels)
    return mels, max_val, classes


def check_clusterization(mels, classes, classes_items=20, n_init=30,
                         seed=0):
    """Fit k-means with k = #unique classes and search all label
    permutations for the best accuracy (reference check_kmeans logic inside
    clustering.py:67-88)."""
    from sklearn.cluster import KMeans

    unique = np.unique(np.asarray(classes))
    kmeans = KMeans(n_clusters=len(unique), random_state=seed,
                    n_init=n_init).fit(mels)
    y = kmeans.labels_
    best_acc, best_classes = 0.0, None
    for perm in itertools.permutations(unique):
        new_classes = [c for c in perm for _ in range(classes_items)]
        acc = float(np.sum(y == np.asarray(new_classes[: len(y)])) / len(y))
        if acc > best_acc:
            best_acc, best_classes = acc, perm
    return best_acc, best_classes, kmeans


def run_clustering(mels, n_clusters=6, n_init=20, seed=0, with_tsne=True):
    """KMeans labels + centroids (+ t-SNE 2-D embedding)."""
    from sklearn.cluster import KMeans

    kmeans = KMeans(n_clusters=n_clusters, random_state=seed,
                    n_init=n_init).fit(mels)
    embedded = None
    if with_tsne and len(mels) > 5:
        from sklearn.manifold import TSNE

        embedded = TSNE(perplexity=min(30, max(5, len(mels) // 4))
                        ).fit_transform(mels)
    return kmeans.labels_, kmeans.cluster_centers_, embedded


def save_tsne_plot(embedded, labels, save_path, n_clusters=6):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    scatter = ax.scatter(embedded[:, 0], embedded[:, 1], c=labels,
                         cmap="tab10", s=12)
    fig.colorbar(scatter, ax=ax)
    fig.savefig(save_path, dpi=300)
    plt.close(fig)


def load_mels_by_emotion_dir(base_path, mel_fn=None):
    """Reference check_kmeans.py:12-50 loader: each subdirectory of
    ``base_path`` is an emotion class containing .wav (mel extracted and
    cached to .npy beside it) or pre-dumped .npy mels. Returns (flattened
    matrix (N, n_mel*min_len), class-id array, class names)."""
    full_mels, class_ids, names = [], [], []
    min_len = float("inf")
    max_val = 0.0
    for em_id, emotion in enumerate(sorted(os.listdir(base_path))):
        em_dir = os.path.join(base_path, emotion)
        if "." in emotion or not os.path.isdir(em_dir):
            continue
        names.append(emotion)
        for path in sorted(os.listdir(em_dir)):
            full = os.path.join(em_dir, path)
            stem, ext = os.path.splitext(full)
            if ext == ".npy":
                mel = np.load(full, allow_pickle=True)
            elif ext == ".wav" and not os.path.exists(stem + ".npy"):
                from gantron_tpu.data.wav import load_wav

                mel = np.asarray(mel_fn(load_wav(full)[None]))[0]
                try:
                    np.save(stem + ".npy", mel)
                except OSError:
                    pass
            else:
                continue
            if mel.ndim == 3:
                mel = mel[0]
            min_len = min(min_len, mel.shape[1])
            max_val = max(max_val, abs(float(mel.min())),
                          abs(float(mel.max())))
            full_mels.append(mel)
            class_ids.append(len(names) - 1)
    if not full_mels:
        return np.zeros((0, 0)), np.zeros((0,), int), names
    min_len = int(min_len)
    mels = np.stack([m[:, :min_len].flatten() / max_val for m in full_mels])
    return mels, np.asarray(class_ids), names


def check_kmeans_accuracy(mels, class_ids, n_clusters=None, n_init=30,
                          seed=0):
    """Reference check_kmeans.py:60-75: k-means fit, then basic accuracy and
    the best accuracy over all cluster->class label permutations."""
    from sklearn.cluster import KMeans

    unique = np.unique(class_ids)
    k = n_clusters or len(unique)
    if k < len(unique):
        raise ValueError(
            f"n_clusters={k} < {len(unique)} distinct classes: the "
            "cluster->class permutation search cannot map every class "
            "(and would IndexError)")
    kmeans = KMeans(n_clusters=k, random_state=seed, n_init=n_init).fit(mels)
    y = kmeans.labels_
    basic_acc = float(np.mean(y == class_ids))
    # The reference brute-forces all k! cluster->class permutations
    # (check_kmeans.py:60-75); the Hungarian assignment on the
    # (class, cluster) confusion matrix finds the same optimum in O(k^3)
    # (rows from a square linear_sum_assignment are always arange(k), so
    # cols IS the class->cluster permutation).
    from scipy.optimize import linear_sum_assignment

    conf = np.zeros((k, k))
    for cls, clu in zip(class_ids, y):
        conf[cls, clu] += 1
    rows, cols = linear_sum_assignment(-conf)
    best_perm = tuple(int(c) for c in cols)
    best_acc = float(conf[rows, cols].sum() / len(y))
    return basic_acc, best_acc, best_perm
