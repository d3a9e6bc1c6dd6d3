"""LSTM primitives vs torch oracles (weight-copied numerical parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.ops.rnn import (LSTMParams, lstm_cell, lstm_scan,
                                 masked_bilstm)

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


def _torch_cell_params(cell):
    return LSTMParams(
        w_ih=jnp.asarray(cell.weight_ih.detach().numpy().T),
        w_hh=jnp.asarray(cell.weight_hh.detach().numpy().T),
        b=jnp.asarray((cell.bias_ih + cell.bias_hh).detach().numpy()),
    )


def test_lstm_cell_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.LSTMCell(12, 20)
    params = _torch_cell_params(cell)

    x = torch.randn(4, 12)
    h = torch.randn(4, 20)
    c = torch.randn(4, 20)
    th, tc = cell(x, (h, c))

    jh, jc = lstm_cell(params, jnp.asarray(x.numpy()), jnp.asarray(h.numpy()),
                       jnp.asarray(c.numpy()))
    np.testing.assert_allclose(_np(jh), th.detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(_np(jc), tc.detach().numpy(), atol=1e-4)


def test_lstm_scan_matches_torch_unrolled():
    torch.manual_seed(1)
    cell = torch.nn.LSTMCell(8, 16)
    params = _torch_cell_params(cell)

    B, T = 3, 11
    xs = torch.randn(B, T, 8)
    h = torch.zeros(B, 16)
    c = torch.zeros(B, 16)
    outs = []
    for t in range(T):
        h, c = cell(xs[:, t], (h, c))
        outs.append(h)
    ref = torch.stack(outs, dim=1).detach().numpy()

    ys = lstm_scan(params, jnp.asarray(xs.numpy()))
    np.testing.assert_allclose(_np(ys), ref, atol=1e-4)


def test_masked_bilstm_matches_torch_packed():
    torch.manual_seed(2)
    B, T, D, H = 4, 13, 10, 7
    lstm = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)

    fw = LSTMParams(
        w_ih=jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
        w_hh=jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
        b=jnp.asarray((lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy()),
    )
    bw = LSTMParams(
        w_ih=jnp.asarray(lstm.weight_ih_l0_reverse.detach().numpy().T),
        w_hh=jnp.asarray(lstm.weight_hh_l0_reverse.detach().numpy().T),
        b=jnp.asarray((lstm.bias_ih_l0_reverse
                       + lstm.bias_hh_l0_reverse).detach().numpy()),
    )

    xs = torch.randn(B, T, D)
    lengths = torch.tensor([13, 9, 5, 1])
    # Sorted descending as pack_padded_sequence requires.
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xs, lengths.numpy(), batch_first=True)
    out_packed, _ = lstm(packed)
    ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=T)
    ref = ref.detach().numpy()

    ys = masked_bilstm(fw, bw, jnp.asarray(xs.numpy()),
                       jnp.asarray(lengths.numpy()))
    np.testing.assert_allclose(_np(ys), ref, atol=1e-4)


def test_masked_bilstm_invariant_to_padding_content():
    key = jax.random.PRNGKey(0)
    from gantron_tpu.ops.rnn import lstm_params_init
    fw = lstm_params_init(jax.random.fold_in(key, 1), 6, 5)
    bw = lstm_params_init(jax.random.fold_in(key, 2), 6, 5)
    xs = jax.random.normal(jax.random.fold_in(key, 3), (2, 9, 6))
    lengths = jnp.asarray([4, 7])
    y1 = masked_bilstm(fw, bw, xs, lengths)
    xs2 = xs.at[0, 4:].set(99.0).at[1, 7:].set(-99.0)
    y2 = masked_bilstm(fw, bw, xs2, lengths)
    np.testing.assert_allclose(_np(y1), _np(y2), atol=1e-6)
    # Outputs beyond the length are exactly zero.
    assert np.all(_np(y1)[0, 4:] == 0)
    assert np.all(_np(y1)[1, 7:] == 0)
