"""WaveGlow vocoder inference in JAX (reference usage: utils.py:217-223,
logger.py:27-31 — ``torch.load(path)['model'].infer(mel, sigma=0.666)``).

The reference treats WaveGlow as an external pre-trained CUDA module; here
the inverse affine-coupling flow is implemented natively so text->wav runs
end-to-end on TPU. Weights convert from the NVIDIA checkpoint layout with
``convert_torch_state_dict`` (handles weight-norm folding and both fused and
per-layer conditioning layouts).

Channel-last layout; all convs are XLA convs over (B, T, C).
"""

from dataclasses import dataclass
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class WaveGlowConfig:
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    n_layers: int = 8
    n_channels: int = 256
    kernel_size: int = 3
    upsample_kernel: int = 1024
    upsample_stride: int = 256

    def remaining_channels(self, k: int) -> int:
        """Audio channels entering flow k (forward direction)."""
        c = self.n_group
        for i in range(k + 1):
            if i % self.n_early_every == 0 and i > 0:
                c -= self.n_early_size
        return c


def _conv1d(x, w, b=None, dilation=1):
    """x: (B, T, Cin); w: (k, Cin, Cout) — 'same' padding."""
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"))
    if b is not None:
        out = out + b
    return out


def _conv_transpose1d(x, w, b=None, stride=256):
    """torch ConvTranspose1d equivalent. x: (B, T, Cin); w stored as
    (k, Cout, Cin) (torch (Cin, Cout, k) transposed); 'VALID' padding.

    When stride divides k (the WaveGlow upsampler: k=1024, stride=256) this
    is computed as ONE (B*T, Cin) @ (Cin, k*Cout) matmul + k/stride shifted
    adds. XLA's generic lowering dilates the input by ``stride`` and runs a
    full conv over the (T*stride)-long output — 256x redundant FLOPs here
    (measured 466 ms vs <2 ms for the whole 500-frame upsample)."""
    k, Cout, Cin = w.shape
    if k % stride == 0:
        B, T, _ = x.shape
        chunks = k // stride
        # y[b, t, c, s, o] = x[b, t] . w[c*stride + s, o]
        w_r = w.reshape(chunks, stride, Cout, Cin)
        y = jnp.einsum("bti,csoi->btcso", x, w_r,
                       preferred_element_type=x.dtype)
        out = jnp.zeros((B, T + chunks - 1, stride, Cout), y.dtype)
        for c in range(chunks):
            out = out.at[:, c : c + T].add(y[:, :, c])
        out = out.reshape(B, (T + chunks - 1) * stride, Cout)
        # (T + chunks - 1) * stride == (T - 1) * stride + k: exact length.
    else:
        out = jax.lax.conv_transpose(
            x, w, strides=(stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)
    if b is not None:
        out = out + b
    return out


def _wn_forward(params: Dict, audio_0, spect, cfg: WaveGlowConfig):
    """WaveNet-like coupling network: gated dilated convs with conditioning.
    audio_0: (B, T, n_half); spect: (B, T, n_mel*n_group).
    Returns (B, T, 2*n_half) = [b, s] affine params."""
    n = cfg.n_channels
    x = _conv1d(audio_0, params["start_w"], params["start_b"])
    cond_all = _conv1d(spect, params["cond_w"], params["cond_b"])
    skip = jnp.zeros_like(x)
    for i in range(cfg.n_layers):
        acts = _conv1d(x, params["in_w"][i], params["in_b"][i],
                       dilation=2**i)
        cond = cond_all[..., 2 * n * i : 2 * n * (i + 1)]
        t = jnp.tanh(acts[..., :n] + cond[..., :n])
        s = jax.nn.sigmoid(acts[..., n:] + cond[..., n:])
        acts = t * s
        res_skip = _conv1d(acts, params["res_skip_w"][i],
                           params["res_skip_b"][i])
        if i < cfg.n_layers - 1:
            x = x + res_skip[..., :n]
            skip = skip + res_skip[..., n:]
        else:
            skip = skip + res_skip
    return _conv1d(skip, params["end_w"], params["end_b"])


class WaveGlow:
    """Inference-only inverse flow. ``params`` layout:
    {'upsample_w','upsample_b','convinv': [W...], 'wn': [per-flow dicts]}."""

    def __init__(self, config: WaveGlowConfig, params, dtype=None):
        """``dtype=jnp.bfloat16`` runs the flow in bf16 (the TPU analogue of
        the reference's ``.half()`` WaveGlow, utils.py:217-223) — ~2x faster,
        output cast back to f32."""
        self.cfg = config
        self.dtype = dtype
        if dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(dtype) if hasattr(x, "astype") else x,
                params)
        self.params = params
        # Params are passed as a jit ARGUMENT (not closed over): closure
        # constants would be inlined into the HLO as literals (hundreds of
        # MB for WaveGlow), bloating compile payloads.
        self._infer = jax.jit(self._infer_impl)

    def n_groups(self, n_mel_frames: int) -> int:
        """Grouped time steps Tg for a T-frame mel (after upsample trim)."""
        cfg = self.cfg
        L = (n_mel_frames - 1) * cfg.upsample_stride + cfg.upsample_kernel
        L -= cfg.upsample_kernel - cfg.upsample_stride
        return L // cfg.n_group

    def z_shapes(self, n_mel_frames: int):
        """Latent shapes in consumption order: [init, early@k for k in
        reversed flows where k % n_early_every == 0 and k > 0]."""
        cfg = self.cfg
        Tg = self.n_groups(n_mel_frames)
        shapes = [(Tg, cfg.remaining_channels(cfg.n_flows - 1))]
        for k in reversed(range(cfg.n_flows)):
            if k % cfg.n_early_every == 0 and k > 0:
                shapes.append((Tg, cfg.n_early_size))
        return shapes

    def draw_z(self, key, batch, n_mel_frames, sigma=1.0):
        zs = []
        for shape in self.z_shapes(n_mel_frames):
            key, sub = jax.random.split(key)
            zs.append(sigma * jax.random.normal(sub, (batch,) + shape))
        return zs

    def infer(self, mel, sigma=0.666, key=None, z=None):
        """mel: (B, n_mel, T) log-mel -> audio (B, T*hop).

        ``z``: optional pre-drawn latents (see ``z_shapes``; unit variance —
        they are scaled by ``sigma`` here). Drawn from ``key`` when absent.
        The reference consumes WaveGlow as ``model.infer(mel, sigma=0.666)``
        (utils.py:217-223); z injection enables deterministic parity tests.
        """
        if z is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            z = self.draw_z(key, mel.shape[0], mel.shape[2])
        if self.dtype is not None:
            mel = mel.astype(self.dtype)
            z = [zi.astype(self.dtype) for zi in z]
        out = self._infer(self.params, mel, z,
                          jnp.asarray(sigma, mel.dtype))
        return out.astype(jnp.float32)

    def _spect_features(self, p, mel):
        """Upsample + group the conditioning mel: (B, Tg, n_group*n_mel)."""
        cfg = self.cfg
        B = mel.shape[0]
        spect = _conv_transpose1d(mel.transpose(0, 2, 1), p["upsample_w"],
                                  p["upsample_b"], cfg.upsample_stride)
        cut = cfg.upsample_kernel - cfg.upsample_stride
        spect = spect[:, : spect.shape[1] - cut]  # (B, L, n_mel)
        Tg = spect.shape[1] // cfg.n_group
        spect = spect[:, : Tg * cfg.n_group]
        # (B, Tg, n_group, n_mel) -> features ordered mel-major like the
        # torch unfold+permute (mel channel varies slowest).
        spect = spect.reshape(B, Tg, cfg.n_group, cfg.n_mel_channels)
        spect = spect.transpose(0, 1, 3, 2).reshape(
            B, Tg, cfg.n_group * cfg.n_mel_channels)
        return spect, Tg

    def _infer_impl(self, p, mel, z, sigma):
        cfg = self.cfg
        B = mel.shape[0]
        spect, Tg = self._spect_features(p, mel)

        z_iter = iter(z)
        audio = sigma * next(z_iter)

        for k in reversed(range(cfg.n_flows)):
            n_half = audio.shape[2] // 2
            audio_0 = audio[..., :n_half]
            audio_1 = audio[..., n_half:]
            output = _wn_forward(p["wn"][k], audio_0, spect, self.cfg)
            b = output[..., :n_half]
            s = output[..., n_half:]
            audio_1 = (audio_1 - b) * jnp.exp(-s)
            audio = jnp.concatenate([audio_0, audio_1], axis=2)
            # Inverse 1x1 conv: right-multiply by W^{-1}.
            audio = audio @ p["convinv_inv"][k]
            if k % cfg.n_early_every == 0 and k > 0:
                audio = jnp.concatenate([sigma * next(z_iter), audio],
                                        axis=2)

        return audio.reshape(B, Tg * cfg.n_group)

    def forward(self, audio, mel):
        """Training-direction flow (audio -> latents), the exact inverse of
        ``infer``: used to validate full-graph invertibility and checkpoint
        conversion. Returns latents in ``z_shapes`` consumption order
        (unit-sigma convention: pass them back via ``infer(..., sigma=1.0)``).
        Not jitted — a validation path, not a serving path.
        """
        cfg = self.cfg
        p = self.params
        B = audio.shape[0]
        spect, Tg = self._spect_features(p, mel)
        x = audio[:, : Tg * cfg.n_group].reshape(B, Tg, cfg.n_group)

        early = []
        for k in range(cfg.n_flows):
            if k % cfg.n_early_every == 0 and k > 0:
                early.append(x[..., : cfg.n_early_size])
                x = x[..., cfg.n_early_size :]
            # Forward 1x1 conv: undo the stored inverse.
            W = jnp.asarray(np.linalg.inv(np.asarray(p["convinv_inv"][k])))
            x = x @ W
            n_half = x.shape[2] // 2
            x0 = x[..., :n_half]
            x1 = x[..., n_half:]
            output = _wn_forward(p["wn"][k], x0, spect, cfg)
            b = output[..., :n_half]
            s = output[..., n_half:]
            x = jnp.concatenate([x0, x1 * jnp.exp(s) + b], axis=2)

        return [x] + list(reversed(early))


def _fold_weight_norm(v, g):
    """weight = g * v / ||v|| with the norm over all but the out-channel dim
    (torch weight_norm dim=0 on (Cout, Cin, k))."""
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    return g.reshape(-1, 1, 1) * v / norm


def _t2j_conv(w):
    """torch conv1d weight (Cout, Cin, k) -> (k, Cin, Cout)."""
    return jnp.asarray(np.transpose(w, (2, 1, 0)))


def convert_torch_state_dict(state_dict, cfg: WaveGlowConfig = WaveGlowConfig()):
    """Convert an NVIDIA WaveGlow state_dict (numpy arrays) to our params.

    Accepts keys like 'upsample.weight', 'WN.0.in_layers.0.weight_v/g',
    'convinv.0.conv.weight'. Handles both the fused 'WN.k.cond_layer.*' and
    legacy per-layer 'WN.k.cond_layers.i.*' conditioning layouts.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def wn_conv(prefix):
        if prefix + ".weight_v" in sd:
            w = _fold_weight_norm(sd[prefix + ".weight_v"],
                                  sd[prefix + ".weight_g"].reshape(-1))
        else:
            w = sd[prefix + ".weight"]
        b = sd.get(prefix + ".bias")
        return _t2j_conv(w), (jnp.asarray(b) if b is not None else None)

    params = {
        # torch ConvTranspose1d weight: (Cin, Cout, k) -> (k, Cout, Cin)
        "upsample_w": jnp.asarray(
            np.transpose(sd["upsample.weight"], (2, 1, 0))),
        "upsample_b": jnp.asarray(sd["upsample.bias"]),
        "convinv_inv": [],
        "wn": [],
    }

    for k in range(cfg.n_flows):
        W = sd[f"convinv.{k}.conv.weight"][:, :, 0]  # (C, C)
        # Right-multiply convention: audio_row @ (W^{-1})^T == W^{-1} @ col.
        params["convinv_inv"].append(jnp.asarray(np.linalg.inv(W).T))

        wn = {}
        wn["start_w"], wn["start_b"] = wn_conv(f"WN.{k}.start")
        wn["end_w"], wn["end_b"] = wn_conv(f"WN.{k}.end")
        if f"WN.{k}.cond_layer.weight_v" in sd or \
                f"WN.{k}.cond_layer.weight" in sd:
            wn["cond_w"], wn["cond_b"] = wn_conv(f"WN.{k}.cond_layer")
        else:  # legacy per-layer conditioning -> concatenate along Cout
            ws, bs = [], []
            for i in range(cfg.n_layers):
                w, b = wn_conv(f"WN.{k}.cond_layers.{i}")
                ws.append(w)
                bs.append(b if b is not None
                          else jnp.zeros((w.shape[-1],)))
            wn["cond_w"] = jnp.concatenate(ws, axis=-1)
            wn["cond_b"] = jnp.concatenate(bs, axis=-1)
        wn["in_w"], wn["in_b"] = [], []
        wn["res_skip_w"], wn["res_skip_b"] = [], []
        for i in range(cfg.n_layers):
            w, b = wn_conv(f"WN.{k}.in_layers.{i}")
            wn["in_w"].append(w)
            wn["in_b"].append(b)
            w, b = wn_conv(f"WN.{k}.res_skip_layers.{i}")
            wn["res_skip_w"].append(w)
            wn["res_skip_b"].append(b)
        params["wn"].append(wn)

    return params


def load_waveglow(checkpoint_path, cfg: WaveGlowConfig = WaveGlowConfig(),
                  dtype=None):
    """Load a torch WaveGlow checkpoint (requires torch, CPU-only is fine).
    ``dtype=jnp.bfloat16`` mirrors the reference's ``.half()`` vocoder
    (utils.py:217-223)."""
    import torch

    payload = torch.load(checkpoint_path, map_location="cpu",
                         weights_only=False)
    model = payload["model"] if isinstance(payload, dict) else payload
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    return WaveGlow(cfg, convert_torch_state_dict(sd, cfg), dtype=dtype)


def random_params(key, cfg: WaveGlowConfig):
    """Random (untrained) params with the correct shapes — for tests."""
    keys = iter(jax.random.split(key, 1000))
    nxt = lambda *s: 0.02 * jax.random.normal(next(keys), s)
    D = cfg.n_mel_channels * cfg.n_group
    params = {
        "upsample_w": nxt(cfg.upsample_kernel, cfg.n_mel_channels,
                          cfg.n_mel_channels),
        "upsample_b": nxt(cfg.n_mel_channels),
        "convinv_inv": [],
        "wn": [],
    }
    for k in range(cfg.n_flows):
        c = cfg.remaining_channels(k)
        q, _ = np.linalg.qr(np.asarray(jax.random.normal(next(keys), (c, c))))
        params["convinv_inv"].append(jnp.asarray(np.linalg.inv(q).T))
        n_half = c // 2
        n = cfg.n_channels
        wn = {
            "start_w": nxt(1, n_half, n), "start_b": nxt(n),
            "end_w": jnp.zeros((1, n, 2 * n_half)),
            "end_b": jnp.zeros((2 * n_half,)),
            "cond_w": nxt(1, D, 2 * n * cfg.n_layers),
            "cond_b": nxt(2 * n * cfg.n_layers),
            "in_w": [nxt(cfg.kernel_size, n, 2 * n)
                     for _ in range(cfg.n_layers)],
            "in_b": [nxt(2 * n) for _ in range(cfg.n_layers)],
            "res_skip_w": [nxt(1, n, 2 * n if i < cfg.n_layers - 1 else n)
                           for i in range(cfg.n_layers)],
            "res_skip_b": [nxt(2 * n if i < cfg.n_layers - 1 else n)
                           for i in range(cfg.n_layers)],
        }
        params["wn"].append(wn)
    return params
