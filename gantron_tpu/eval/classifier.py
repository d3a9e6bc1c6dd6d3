"""Emotion-classifier training pipeline (reference: classifier.py:190-334).

Replaces pytorch-lightning with a compact optax loop:
  * ``prepare_npy_mels`` caches classifier-style dB mels next to the wavs
    (reference load_npy_mels/load_mel, classifier.py:190-226);
  * ``MelCrops`` applies the MelLoader transform: offset crop, additive
    uniform noise clipped to [-80, 0], ``/80 + 1`` normalization
    (reference data_utils.py:134-160);
  * ``ClassifierTrainer.fit`` runs Adam + cosine LR (eta_min 1e-6) with the
    random-crop forward and argmax accuracy (classifier.py:137-177).
"""

import os
import random
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gantron_tpu.audio.mel import PowerMelDB
from gantron_tpu.data.filelists import load_cremad_ravdess, load_vesus
from gantron_tpu.data.wav import load_wav
from gantron_tpu.models.classifier import Classifier, crop_batch


def prepare_npy_mels(filepaths_lists: Sequence[List[str]], hp,
                     file_format=".wav"):
    """Cache dB mels as .npy; returns the new path lists."""
    mel_fn = PowerMelDB(hp.sampling_rate, hp.n_ftt, hp.hop_length,
                        hp.n_mel_channels)
    out_lists = []
    for filepaths in filepaths_lists:
        out = []
        for path in filepaths:
            new_path = path.split(file_format)[0] + ".npy"
            if not os.path.exists(new_path):
                wav = load_wav(path, hp.sampling_rate)
                mel = np.asarray(mel_fn(wav[None]))[0]
                np.save(new_path, mel)
            out.append(new_path)
        out_lists.append(out)
    return out_lists


def load_files(files, audio_path, use_labels, vesus_only=False):
    """Merge VESUS (+ CREMA-D + RAVDESS) filelists
    (reference classifier.py:229-241)."""
    filepaths, _, emotions = load_vesus(files[0],
                                        audio_path + "/VESUS/Audio/",
                                        use_labels=use_labels, use_text=False)
    emotions = [list(e) for e in emotions]
    if not vesus_only:
        c_files, c_emo = load_cremad_ravdess(
            files[1], audio_path + "/Crema-D/AudioWAV/", use_labels, True)
        filepaths += c_files
        emotions += [list(e) for e in c_emo]
        r_files, r_emo = load_cremad_ravdess(
            files[2], audio_path + "/RAVDESS/Speech/", use_labels, False)
        filepaths += r_files
        emotions += [list(e) for e in r_emo]
    return filepaths, emotions


def load_extension(extend_path, use_labels, filepaths, emotions):
    """Extend training data with GANtron-generated wavs whose labels are
    encoded in the filename (reference classifier.py:244-251)."""
    to_label = ((lambda x: 1.0 if float(x) > 0 else 0.0)
                if use_labels in ("one", "intended") else float)
    for file in sorted(os.listdir(extend_path)):
        if ".wav" not in file or file[0] == "5":
            continue
        label = [to_label(v)
                 for v in file.split(".wav")[0].split("-")[-1].split(",")]
        filepaths.append(os.path.join(extend_path, file))
        emotions.append(label)


class MelCrops:
    """In-memory dataset of (dB mel, label) with the MelLoader transform."""

    def __init__(self, mel_paths, emotions, mel_offset=0, max_noise=0,
                 seed=0):
        assert len(mel_paths) == len(emotions)
        self.mels = [np.load(p, allow_pickle=True).astype(np.float32)
                     for p in mel_paths]
        self.emotions = [np.asarray(e, np.float32) for e in emotions]
        self.mel_offset = mel_offset
        self.max_noise = max_noise
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.mels)

    def item(self, i):
        mel = self.mels[i][:, self.mel_offset:]
        if self.max_noise:
            mel = mel + self.rng.random_sample(mel.shape) * self.max_noise
            mel = np.clip(mel, -80.0, 0.0)
        return mel / 80.0 + 1.0, self.emotions[i]

    def batches(self, batch_size, shuffle=True, drop_last=True, pad_to=None):
        order = list(range(len(self)))
        if shuffle:
            random.Random(self.rng.randint(1 << 30)).shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i:i + batch_size]
            if drop_last and len(idx) < batch_size and i > 0:
                break
            # A dataset smaller than batch_size yields its single short
            # batch rather than nothing — zero batches would make fit()
            # average over an empty list (tiny study corpora hit this).
            items = [self.item(j) for j in idx]
            T = max(m.shape[1] for m, _ in items)
            if pad_to:
                T = max(T, pad_to)
            T = ((T + 99) // 100) * 100  # bucket to bound compile count
            B = len(items)
            M = items[0][0].shape[0]
            mels = np.zeros((B, M, T), np.float32)
            lengths = np.zeros((B,), np.int32)
            labels = np.zeros((B, len(items[0][1])), np.float32)
            for k, (m, e) in enumerate(items):
                mels[k, :, : m.shape[1]] = m
                lengths[k] = m.shape[1]
                labels[k] = e
            yield mels, lengths, labels


class ClassifierTrainer:
    def __init__(self, hp, seed=0):
        self.hp = hp
        self.model = Classifier(hp)
        self.use_bce = hp.use_labels in ("one", "intended")
        self.rng = jax.random.PRNGKey(seed)
        self.variables = None
        self._jit_train = None
        self._jit_eval = None

    def _loss(self, logits, labels):
        if self.use_bce:
            return jnp.mean(jnp.maximum(logits, 0) - logits * labels
                            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.mean((jax.nn.softmax(logits, -1) - labels) ** 2)

    def _init(self, sample_crops):
        # Jitted: eager init dispatches one tiny compile per parameter,
        # which is slow on remote-tunnel devices.
        init = jax.jit(lambda r, x: self.model.init(r, x, train=False))
        self.variables = init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(sample_crops))
        self.tx = optax.chain(
            optax.add_decayed_weights(self.hp.weight_decay),
            optax.scale_by_adam())
        self.opt_state = jax.jit(self.tx.init)(self.variables["params"])

        model, tx, hp = self.model, self.tx, self.hp

        def train_step(params, batch_stats, opt_state, mels, lengths, labels,
                       lr, rng):
            k_crop, k_drop = jax.random.split(rng)
            crops = crop_batch(k_crop, mels, lengths, hp.n_frames,
                               hp.mel_offset)

            def loss_fn(p):
                logits, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, crops,
                    train=True, rngs={"dropout": k_drop},
                    mutable=["batch_stats"])
                return self._loss(logits, labels), (logits,
                                                    mut["batch_stats"])

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            acc = jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(labels, -1))
            return params, new_bs, opt_state, loss, acc

        def eval_step(params, batch_stats, mels, lengths, labels, rng):
            crops = crop_batch(rng, mels, lengths, hp.n_frames, hp.mel_offset)
            logits = model.apply({"params": params,
                                  "batch_stats": batch_stats}, crops,
                                 train=False)
            loss = self._loss(logits, labels)
            acc = jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(labels, -1))
            return loss, acc

        self._jit_train = jax.jit(train_step)
        self._jit_eval = jax.jit(eval_step)

    def _lr(self, epoch):
        """Cosine annealing to 1e-6 over ``epochs`` (reference
        classifier.py:137-141)."""
        hp = self.hp
        return (1e-6 + 0.5 * (hp.lr - 1e-6)
                * (1 + np.cos(np.pi * epoch / hp.epochs)))

    def fit(self, train_data: MelCrops, val_data: Optional[MelCrops] = None,
            epochs: Optional[int] = None, log_fn=None):
        hp = self.hp
        epochs = epochs or hp.epochs
        if self.variables is None:
            self._init(np.zeros((1, hp.n_mel_channels, hp.n_frames),
                                np.float32))
        history = []
        for epoch in range(epochs):
            lr = jnp.float32(self._lr(epoch))
            losses, accs = [], []
            for mels, lengths, labels in train_data.batches(
                    hp.batch_size, pad_to=hp.n_frames + hp.mel_offset):
                self.rng, sub = jax.random.split(self.rng)
                params, bs, self.opt_state, loss, acc = self._jit_train(
                    self.variables["params"],
                    self.variables.get("batch_stats", {}), self.opt_state,
                    jnp.asarray(mels), jnp.asarray(lengths),
                    jnp.asarray(labels), lr, sub)
                self.variables = {"params": params, "batch_stats": bs}
                losses.append(float(loss))
                accs.append(float(acc))
            if not losses:
                raise ValueError(
                    "training dataset produced zero batches "
                    f"(need >= batch_size={hp.batch_size} crops; "
                    "np.mean([]) would silently train on NaN metrics)")
            record = {"epoch": epoch, "train_loss": float(np.mean(losses)),
                      "train_acc": float(np.mean(accs))}
            if val_data is not None:
                record.update(self.evaluate(val_data))
            history.append(record)
            if log_fn:
                log_fn(record)
        return history

    def evaluate(self, data: MelCrops, prefix="val_"):
        hp = self.hp
        if self.variables is None:
            self._init(np.zeros((1, hp.n_mel_channels, hp.n_frames),
                                np.float32))
        losses, accs = [], []
        for mels, lengths, labels in data.batches(
                hp.batch_size, shuffle=False, drop_last=False,
                pad_to=hp.n_frames + hp.mel_offset):
            self.rng, sub = jax.random.split(self.rng)
            loss, acc = self._jit_eval(
                self.variables["params"],
                self.variables.get("batch_stats", {}), jnp.asarray(mels),
                jnp.asarray(lengths), jnp.asarray(labels), sub)
            losses.append(float(loss))
            accs.append(float(acc))
        if not losses:  # empty split (e.g. a tiny val fraction rounding to 0)
            return {prefix + "loss": float("nan"), prefix + "acc": 0.0,
                    prefix + "empty": True}
        return {prefix + "loss": float(np.mean(losses)),
                prefix + "acc": float(np.mean(accs))}

    def save(self, path):
        """Persist params + BN stats + hparams (orbax directory)."""
        import dataclasses

        import orbax.checkpoint as ocp

        payload = {
            "params": jax.tree.map(np.asarray, self.variables["params"]),
            "batch_stats": jax.tree.map(
                np.asarray, self.variables.get("batch_stats", {})),
        }
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)
        ckptr.wait_until_finished()
        import json

        hparams = {f.name: getattr(self.hp, f.name)
                   for f in dataclasses.fields(self.hp)
                   if not isinstance(getattr(self.hp, f.name), list)}
        with open(os.path.abspath(path) + ".hparams.json", "w") as f:
            json.dump(hparams, f)

    @classmethod
    def load(cls, path, hp=None):
        import orbax.checkpoint as ocp

        from gantron_tpu.config import ClassifierHParams

        payload = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        if hp is None:
            import json

            hp = ClassifierHParams()
            meta_path = os.path.abspath(path) + ".hparams.json"
            if os.path.exists(meta_path):
                for k, v in json.load(open(meta_path)).items():
                    hp.add_param(k, v)
        trainer = cls(hp)
        trainer.variables = {"params": payload["params"],
                             "batch_stats": payload.get("batch_stats", {})}
        trainer._init_steps_only()
        return trainer

    def _init_steps_only(self):
        """Compile steps for an already-initialized model (post-restore)."""
        if self._jit_eval is None and self.variables is not None:
            hpn = self.hp
            sample = np.zeros((1, hpn.n_mel_channels, hpn.n_frames),
                              np.float32)
            variables = self.variables
            self._init(sample)
            self.variables = variables

    def predict_probs(self, mels, lengths):
        """Eval-mode probabilities on cropped windows."""
        hp = self.hp
        self.rng, sub = jax.random.split(self.rng)
        crops = crop_batch(sub, jnp.asarray(mels), jnp.asarray(lengths),
                           hp.n_frames, hp.mel_offset)
        logits = self.model.apply(
            {"params": self.variables["params"],
             "batch_stats": self.variables.get("batch_stats", {})},
            crops, train=False)
        return np.asarray(jax.nn.softmax(logits, -1))
