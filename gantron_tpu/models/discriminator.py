"""GAN discriminators over mel-spectrogram windows
(reference: model.py:500-583, layers.py:43-73).

Both variants score fixed-size windows of ``discriminator_window`` mel frames;
the Wasserstein-style ``adversarial_loss`` averages per-sample window scores
over each sample's valid windows. The per-sample Python loops of the
reference are replaced by fully vectorized masked reductions (static shapes).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from gantron_tpu.models.modules import ConvNorm, dropout as _dropout


class Discriminator(nn.Module):
    """Conv discriminator: mel frames regrouped into windows, dilated conv
    stack scoring each window (reference model.py:500-540)."""

    hp: object

    @property
    def window(self):
        return self.hp.discriminator_window

    @property
    def in_dim(self):
        return self.window * self.hp.n_mel_channels

    @nn.compact
    def __call__(self, mel, train: bool = True):
        """mel: (B, T, n_mel), any T >= window.

        Returns per-position scores (B, ceil(T / window)).

        Reference-exact semantics (model.py:523-527): a non-multiple T gets
        an *overlapping tail* window appended (concat of the truncated body
        and the last ``window`` frames), then the (B, T', M) block is
        row-major reshaped to (B, window*n_mel, T'//window) — channels
        interleave time and mel exactly as the reference's
        ``inputs.reshape(B, in_dim, -1)`` — and the dilated conv stack runs
        over the last axis. T is static under jit, so the tail concat is
        trace-time control flow.
        """
        hp = self.hp
        B, T, M = mel.shape
        r = T % self.window
        if r:
            mel = jnp.concatenate([mel[:, :T - r], mel[:, -self.window:]],
                                  axis=1)
        x = mel.reshape(B, self.in_dim, -1)   # (B, 1600, n_win) row-major
        x = x.transpose(0, 2, 1)              # channel-last for NWC convs

        first_hidden = min(
            (self.in_dim // hp.discriminator_dim + 1) * hp.discriminator_dim,
            1024)
        dims_dils = [(first_hidden, 1), (hp.discriminator_dim, 2),
                     (hp.discriminator_dim, 2), (hp.n_mel_channels, 2)]
        rng = self.make_rng("dropout") if train else None
        for i, (feats, dil) in enumerate(dims_dils):
            x = ConvNorm(feats, kernel_size=5, dilation=dil, gain="tanh",
                         name=f"conv_{i}")(x)
            if train:
                rng, sub = jax.random.split(rng)
                x = _dropout(x, 0.5, sub)
            x = jnp.tanh(x)
        x = nn.Conv(1, (1,), use_bias=True, name="out")(x)
        return x[..., 0]

    def adversarial_loss(self, mel, target_length, train: bool = True):
        """Mean window score over each sample's ceil(len/window) valid windows
        (reference model.py:529-540). ``mel``: (B, n_mel, T) reference layout.
        """
        scores = self(mel.transpose(0, 2, 1), train)  # (B, W)
        n_windows = scores.shape[1]
        n_valid = jnp.ceil(target_length / self.window).astype(jnp.int32)
        n_valid = jnp.clip(n_valid, 1, n_windows)
        valid = jnp.arange(n_windows)[None, :] < n_valid[:, None]
        per_sample = jnp.sum(jnp.where(valid, scores, 0.0), axis=1) / n_valid
        return jnp.mean(per_sample)


class LinearDiscriminator(nn.Module):
    """MLP discriminator over flattened windows with random overlap
    (reference model.py:543-583)."""

    hp: object
    max_window_overlap: int = 6

    @nn.compact
    def __call__(self, windows, train: bool = True):
        """windows: (..., window * n_mel) flattened mel windows -> (..., 1)."""
        hp = self.hp
        rng = self.make_rng("dropout") if train else None
        x = windows
        for i in range(3):
            x = nn.Dense(hp.discriminator_dim,
                         kernel_init=nn.initializers.lecun_normal(),
                         name=f"dense_{i}")(x)
            if train:
                rng, sub = jax.random.split(rng)
                x = _dropout(x, 0.5, sub)
            x = jnp.tanh(x)
        return nn.Dense(1, name="out")(x)

    def adversarial_loss(self, mel, target_length, train: bool = True,
                         overlaps=None):
        """Sliding windows advancing by window - U{0..6} frames, plus one
        tail window ending at the true length (reference model.py:567-583).

        ``mel``: (B, n_mel, T). ``overlaps``: optional explicit
        (B, >=max_windows) int draws in [0, max_window_overlap] replacing the
        ``windows`` rng stream — the parity tests inject the reference's
        exact ``random.randint`` draws through this.
        """
        hp = self.hp
        W = hp.discriminator_window
        B, M, T = mel.shape
        x = mel.transpose(0, 2, 1)  # (B, T, M)

        # Max number of sliding windows with the smallest possible stride.
        min_stride = W - self.max_window_overlap
        max_windows = max(T // min_stride + 1, 1)

        if overlaps is None:
            rng = self.make_rng("windows")
            overlaps = jax.random.randint(rng, (B, max_windows), 0,
                                          self.max_window_overlap + 1)
        else:
            overlaps = jnp.asarray(overlaps, jnp.int32)[:, :max_windows]
        strides = W - overlaps
        starts = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32),
             jnp.cumsum(strides[:, :-1], axis=1)], axis=1)  # (B, max_windows)
        valid = starts + W < target_length[:, None]
        starts = jnp.clip(starts, 0, T - W)

        # Gather all windows: (B, max_windows, W, M).
        idx = starts[..., None] + jnp.arange(W)[None, None, :]
        win = jnp.take_along_axis(x[:, None], idx[..., None], axis=2)
        flat = win.reshape(B, max_windows, W * M)

        tail_start = jnp.clip(target_length - W, 0, T - W)
        tail_idx = tail_start[:, None] + jnp.arange(W)[None, :]
        tail = jnp.take_along_axis(x, tail_idx[..., None], axis=1)
        tail_flat = tail.reshape(B, 1, W * M)

        scores = self(jnp.concatenate([flat, tail_flat], axis=1),
                      train)[..., 0]  # (B, max_windows + 1)
        valid = jnp.concatenate(
            [valid, jnp.ones((B, 1), bool)], axis=1)
        per_sample = (jnp.sum(jnp.where(valid, scores, 0.0), axis=1)
                      / jnp.sum(valid, axis=1))
        return jnp.mean(per_sample)


def make_discriminator(hp):
    """Factory mirroring reference train.py:116."""
    if hp.discriminator_type == "linear":
        return LinearDiscriminator(hp)
    return Discriminator(hp)
