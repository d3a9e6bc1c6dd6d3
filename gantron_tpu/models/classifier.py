"""Emotion classifier (reference: classifier.py:21-135).

Two variants over fixed-size mel crops (n_frames x n_mel):
  * linear: 3 x (Dense + BatchNorm + Dropout 0.5 + LeakyReLU 0.1) + head;
  * conv: 4 x (Conv2d k3 + BatchNorm + Dropout + LeakyReLU [+ AvgPool 2x2])
    + flatten + Dense head.

Loss: BCE-with-logits for 'one'/'intended' labels, MSE over softmax for
'multi' (reference classifier.py:62-64, 107-110). Training uses a random
``n_frames`` crop per sample starting at/after ``mel_offset``
(classifier.py:95-101); inference slides a window over arbitrary lengths
(classifier.py:112-135).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from gantron_tpu.models.modules import dropout as _dropout


class Classifier(nn.Module):
    hp: object  # ClassifierHParams

    @property
    def n_frames(self):
        return self.hp.n_frames

    @nn.compact
    def __call__(self, crops, train: bool = True):
        """crops: (B, n_mel, n_frames) normalized mel crops -> logits
        (B, n_emotions)."""
        hp = self.hp
        rng = self.make_rng("dropout") if train else None
        if hp.linear_model:
            x = crops.reshape(crops.shape[0], -1)
            for i in range(3):
                x = nn.Dense(hp.model_size, name=f"dense_{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn_{i}")(x)
                if train:
                    rng, sub = jax.random.split(rng)
                    x = _dropout(x, 0.5, sub)
                x = nn.leaky_relu(x, 0.1)
            return nn.Dense(hp.n_emotions, name="head")(x)

        # Conv variant: (B, n_mel, n_frames) -> NHWC.
        x = crops[..., None]
        widths = [hp.model_size] * 3 + [hp.n_emotions]
        for i, w in enumerate(widths):
            x = nn.Conv(w, (3, 3), padding="SAME", name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}")(x)
            if train:
                rng, sub = jax.random.split(rng)
                x = _dropout(x, 0.5, sub)
            x = nn.leaky_relu(x, 0.1)
            if i < 3:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(hp.n_emotions, name="head")(x)

    def predict(self, crops):
        """Eval-mode class probabilities for fixed-size crops."""
        logits = self(crops, train=False)
        return jax.nn.softmax(logits, axis=-1)


def random_crop_start(key, length, n_frames, mel_offset):
    """Random crop start (reference classifier.py:46-53): in
    [mel_offset, length - n_frames) when possible."""
    hi = jnp.maximum(length - n_frames, 1)
    lo = jnp.where(length - n_frames > mel_offset, mel_offset, 0)
    return jax.random.randint(key, (), 0, 1 << 30) % jnp.maximum(hi - lo, 1) + lo


def crop_batch(key, mels, lengths, n_frames, mel_offset):
    """(B, n_mel, T) -> (B, n_mel, n_frames) random crops."""
    B, M, T = mels.shape

    def one(k, mel, length):
        start = random_crop_start(k, length, n_frames, mel_offset)
        start = jnp.clip(start, 0, T - n_frames)
        return jax.lax.dynamic_slice(mel, (0, start), (M, n_frames))

    keys = jax.random.split(key, B)
    return jax.vmap(one)(keys, mels, lengths)


def sliding_window_probs(apply_fn, variables, mel, n_frames):
    """Average class probabilities over non-overlapping windows, plus one
    tail window (reference classifier.py:112-135). mel: (B, n_mel, T)."""
    B, M, T = mel.shape
    n_full = max(T // n_frames, 0)
    crops = []
    for i in range(n_full):
        crops.append(mel[:, :, i * n_frames : (i + 1) * n_frames])
    if T % n_frames != 0 or n_full == 0:
        crops.append(mel[:, :, max(T - n_frames, 0) : T] if T >= n_frames
                     else jnp.pad(mel, ((0, 0), (0, 0), (0, n_frames - T))))
    stacked = jnp.concatenate(crops, axis=0)  # (B * n_windows, M, n_frames)
    probs = apply_fn(variables, stacked)
    return probs.reshape(len(crops), B, -1).mean(axis=0)
