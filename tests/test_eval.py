"""Evaluation toolkit tests: classifier training, sampling, clustering,
and the end-to-end study pipeline (tiny sizes, Griffin-Lim vocoder)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.config import ClassifierHParams, HParams
from gantron_tpu.eval.classifier import ClassifierTrainer, MelCrops
from gantron_tpu.eval.clustering import (check_clusterization, load_mels,
                                         run_clustering)
from gantron_tpu.eval.sampling import force_style_emotions, group_emotions
from gantron_tpu.models import Tacotron2


def tiny_chp(**over):
    hp = ClassifierHParams()
    hp.add_params(dict(n_frames=16, model_size=32, batch_size=8, epochs=10,
                       mel_offset=2, max_noise=1))
    for k, v in over.items():
        hp.add_param(k, v)
    return hp


def synth_crops_dataset(tmp_path, n=64, n_mel=80, seed=0):
    """Class-separable synthetic dB mels saved as .npy."""
    rng = np.random.RandomState(seed)
    paths, labels = [], []
    for i in range(n):
        cls = i % 2
        T = rng.randint(30, 60)
        mel = rng.randn(n_mel, T) * 2 - 70
        mel[cls * 40 : cls * 40 + 40] += 55  # class-dependent half-band
        mel = np.clip(mel, -80, 0).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, mel)
        paths.append(p)
        label = np.zeros(5, np.float32)
        label[cls] = 1
        labels.append(label)
    return paths, labels


@pytest.mark.parametrize("linear", [True, False])
def test_classifier_learns_separable_classes(tmp_path, linear):
    hp = tiny_chp(linear_model=linear, use_labels="intended")
    paths, labels = synth_crops_dataset(tmp_path)
    data = MelCrops(paths, labels, hp.mel_offset, hp.max_noise)
    trainer = ClassifierTrainer(hp)
    history = trainer.fit(data, data, epochs=10)
    assert history[-1]["val_acc"] >= 0.7  # separable -> should learn fast


def test_melcrops_normalization(tmp_path):
    paths, labels = synth_crops_dataset(tmp_path, n=2)
    data = MelCrops(paths, labels, mel_offset=0, max_noise=0)
    mel, _ = data.item(0)
    assert mel.min() >= 0.0 and mel.max() <= 1.0


def test_group_emotions_modes():
    key = jax.random.PRNGKey(0)
    ints = group_emotions(6, True, False, key)
    assert ints.shape == (6, 5) and set(np.unique(ints)) <= {0.0, 1.0}
    pre = group_emotions(6, False, True, key)
    assert pre.shape == (6, 5)
    np.testing.assert_allclose(pre[0], [0.6, 0, 0, 0, 0])
    rnd = group_emotions(4, False, False, key)
    assert rnd.shape == (4, 5) and rnd.min() >= 0 and rnd.max() <= 1
    with pytest.raises(ValueError):
        group_emotions(7, True, False, key)


def _tiny_generator():
    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=48, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=32,
        postnet_n_convolutions=3, noise_size=8, discriminator_dim=32,
        max_decoder_steps=24, use_noise=True, use_labels=False,
        scan_unroll=2))
    model = Tacotron2(hp)
    text = jnp.ones((1, 6), jnp.int32)
    mels = jnp.zeros((1, 80, 20))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        text, jnp.asarray([6]), mels, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5)), jnp.asarray([20]), train=False)
    return hp, model, variables


def test_force_style_emotions_writes_groups(tmp_path):
    hp, model, variables = _tiny_generator()
    seq = jnp.asarray(np.array([[5, 8, 12, 20, 9]], np.int32))
    reached = force_style_emotions(
        model, variables, seq, str(tmp_path), speaker=None,
        force_emotions=False, force_style=True,
        style_shape=[5, hp.noise_size], n_groups=2, n_samples_styles=3,
        simple_name=True, max_decoder_steps=hp.max_decoder_steps,
        key=jax.random.PRNGKey(0))
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 6
    assert reached <= 6
    mel = np.load(tmp_path / files[0])
    assert mel.shape[0] == 80 and 1 <= mel.shape[1] <= hp.max_decoder_steps


def test_clustering_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    for g in range(2):
        for i in range(10):
            mel = rng.randn(80, 30).astype(np.float32) * 2 - 40 + g * 14
            np.save(str(tmp_path / f"{g}-{i}.npy"), mel)
    mels, max_val, classes = load_mels(str(tmp_path))
    assert mels.shape[0] == 20 and len(classes) == 20
    acc, best_classes, _ = check_clusterization(mels, classes,
                                               classes_items=10)
    assert acc >= 0.9  # well-separated synthetic groups
    labels, centers, emb = run_clustering(mels, n_clusters=2)
    assert len(labels) == 20 and centers.shape[0] == 2


def test_check_kmeans_emotion_dirs(tmp_path):
    """Reference check_kmeans.py surface: per-emotion subdirectories of
    wavs, k-means separability with permutation-matched accuracy."""
    import numpy as np

    from gantron_tpu.audio.mel import MelSpectrogram
    from gantron_tpu.data.toy import synth_utterance
    from gantron_tpu.data.wav import write_wav
    from gantron_tpu.eval.clustering import (check_kmeans_accuracy,
                                             load_mels_by_emotion_dir)

    rng = np.random.RandomState(0)
    for emotion, chars in [("calm", "aeiou"), ("tense", "mnst")]:
        d = tmp_path / emotion
        d.mkdir()
        for i in range(5):
            text = "".join(rng.choice(list(chars)) for _ in range(6))
            write_wav(str(d / f"{i}.wav"), synth_utterance(text, rng))

    mels, class_ids, names = load_mels_by_emotion_dir(
        str(tmp_path), mel_fn=MelSpectrogram())
    assert names == ["calm", "tense"] and len(mels) == 10
    # .npy caches written beside the wavs (reference check_kmeans.py:30-31).
    assert (tmp_path / "calm" / "0.npy").exists()
    basic, best, perm = check_kmeans_accuracy(mels, class_ids)
    assert best >= 0.9  # disjoint tone bands must separate


def test_check_kmeans_hungarian_fallback():
    """n_clusters > 9 uses the Hungarian assignment instead of the k!
    permutation search (same optimum, polynomial time)."""
    from gantron_tpu.eval.clustering import check_kmeans_accuracy

    rng = np.random.RandomState(0)
    k = 12
    centers = [np.eye(4)[i % 4] * (1 + i) for i in range(k)]
    mels = np.concatenate(
        [rng.randn(8, 4) * 0.05 + c for c in centers])
    class_ids = np.repeat(np.arange(k), 8)
    basic, best, perm = check_kmeans_accuracy(mels, class_ids)
    assert best >= 0.9 and len(perm) == k
