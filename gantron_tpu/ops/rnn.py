"""Recurrent primitives as pure functions over explicit parameter pytrees.

TPU-native replacements for the reference's cuDNN LSTMs
(reference: model.py:180-182, 252-254, 261-263):

  * ``lstm_cell``      — one LSTMCell step (torch gate order/semantics).
  * ``lstm_scan``      — length-masked unidirectional scan.
  * ``masked_bilstm``  — packed-sequence-equivalent bidirectional LSTM: the
    backward direction starts at each sequence's true last frame, and outputs
    beyond each length are zero (matching pack_padded/pad_packed behavior).

Keeping these as pure functions (rather than lifted linen transforms) lets the
decoder compose them inside a single ``lax.scan`` and lets us hoist
state-independent input projections out of the loop.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LSTMParams(NamedTuple):
    w_ih: jax.Array  # (input_dim, 4*hidden)
    w_hh: jax.Array  # (hidden, 4*hidden)
    b: jax.Array     # (4*hidden,)  == torch's b_ih + b_hh


def lstm_params_init(key, input_dim, hidden, dtype=jnp.float32):
    """torch LSTMCell default init: U(-1/sqrt(hidden), 1/sqrt(hidden))."""
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / np.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    # Two bias draws summed, matching torch's separate b_ih/b_hh.
    return LSTMParams(
        w_ih=u(k1, (input_dim, 4 * hidden)),
        w_hh=u(k2, (hidden, 4 * hidden)),
        b=u(k3, (4 * hidden,)) + u(jax.random.fold_in(k3, 1), (4 * hidden,)),
    )


def lstm_cell(params: LSTMParams, x, h, c):
    """One step. Gate order i, f, g, o (torch layout)."""
    gates = x @ params.w_ih + h @ params.w_hh + params.b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell_precomputed(params: LSTMParams, x_proj, h, c):
    """Step where ``x @ w_ih + b`` was precomputed (hoisted out of the scan)."""
    gates = x_proj + h @ params.w_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(params: LSTMParams, xs, lengths=None, unroll=1):
    """Unidirectional masked scan.

    Args:
      xs: (B, T, D) inputs.
      lengths: (B,) valid lengths or None. Beyond a sequence's length the
        hidden state is held and the output is zero.

    Returns: (B, T, H) outputs.
    """
    B, T, _ = xs.shape
    H = params.w_hh.shape[0]
    h0 = jnp.zeros((B, H), xs.dtype)
    c0 = jnp.zeros((B, H), xs.dtype)

    # Hoist the input projection: one big MXU matmul instead of T small ones.
    x_proj = xs @ params.w_ih + params.b  # (B, T, 4H)

    def step(carry, inp):
        h, c = carry
        xp, t = inp
        h_new, c_new = lstm_cell_precomputed(params, xp, h, c)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            h_new = jnp.where(valid, h_new, h)
            c_new = jnp.where(valid, c_new, c)
            out = jnp.where(valid, h_new, 0.0)
        else:
            out = h_new
        return (h_new, c_new), out

    ts = jnp.arange(T)
    if not isinstance(T, int):
        # Shape-polymorphic export: lax.scan can't unroll over a symbolic
        # length (the remainder split needs a concrete trip count).
        unroll = 1
    (_, _), ys = jax.lax.scan(step, (h0, c0),
                              (x_proj.transpose(1, 0, 2), ts),
                              unroll=unroll)
    return ys.transpose(1, 0, 2)


def _reverse_valid(xs, lengths):
    """Per-row reversal of the valid prefix: out[b, t] = xs[b, len_b-1-t]
    for t < len_b, else 0."""
    B, T = xs.shape[:2]
    t = jnp.arange(T)[None, :]
    idx = jnp.clip(lengths[:, None] - 1 - t, 0, T - 1)  # (B, T)
    out = jnp.take_along_axis(xs, idx[..., None], axis=1)
    return jnp.where((t < lengths[:, None])[..., None], out, 0.0)


def masked_bilstm(params_fw: LSTMParams, params_bw: LSTMParams, xs, lengths,
                  unroll=1):
    """Bidirectional LSTM equivalent to torch's packed BiLSTM.

    Returns (B, T, 2H): forward and backward outputs concatenated, zero beyond
    each sequence's length.
    """
    fw = lstm_scan(params_fw, xs, lengths, unroll=unroll)
    xs_rev = _reverse_valid(xs, lengths)
    bw_rev = lstm_scan(params_bw, xs_rev, lengths, unroll=unroll)
    bw = _reverse_valid(bw_rev, lengths)
    return jnp.concatenate([fw, bw], axis=-1)
