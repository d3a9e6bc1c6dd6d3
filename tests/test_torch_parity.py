"""End-to-end numerical parity: our Tacotron2 vs a torch oracle with the
same (converted) weights.

The oracle is assembled HERE from torch primitives following the published
Tacotron2/GANtron architecture (embedding -> conv+BN encoder -> BiLSTM ->
location-sensitive attention decoder -> postnet). Dropout is disabled on
both sides and BatchNorm uses running stats, making the comparison
deterministic. This is the test backing the <=1e-3 mel-MAE north star.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gantron_tpu.models.tacotron2 as taco_mod
from gantron_tpu.config import HParams
from gantron_tpu.models import Tacotron2
from gantron_tpu.utils.torch_compat import tacotron2_from_torch

torch = pytest.importorskip("torch")
F = torch.nn.functional


def tiny_hp():
    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=24, encoder_embedding_dim=24,
        encoder_n_convolutions=2, attention_rnn_dim=32, decoder_rnn_dim=32,
        prenet_dim=16, attention_dim=20, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=24,
        postnet_n_convolutions=3, n_mel_channels=12,
        use_noise=False, use_labels=False, noise_size=0,
        scan_unroll=2))
    return hp


class TorchOracle(torch.nn.Module):
    """Reference-architecture Tacotron2 assembled from torch primitives."""

    def __init__(self, hp):
        super().__init__()
        E, A, R, P, D = (hp.encoder_embedding_dim, hp.attention_rnn_dim,
                         hp.decoder_rnn_dim, hp.prenet_dim,
                         hp.encoder_embedding_dim)
        M = hp.n_mel_channels
        K = hp.encoder_kernel_size
        self.hp = hp
        self.embedding = torch.nn.Embedding(hp.n_symbols,
                                            hp.symbols_embedding_dim)
        self.enc_convs = torch.nn.ModuleList(
            [torch.nn.Conv1d(E, E, K, padding=K // 2)
             for _ in range(hp.encoder_n_convolutions)])
        self.enc_bns = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(E)
             for _ in range(hp.encoder_n_convolutions)])
        self.lstm = torch.nn.LSTM(E, E // 2, 1, batch_first=True,
                                  bidirectional=True)
        self.prenet0 = torch.nn.Linear(M, P, bias=False)
        self.prenet1 = torch.nn.Linear(P, P, bias=False)
        self.attention_rnn = torch.nn.LSTMCell(P + D, A)
        self.query = torch.nn.Linear(A, hp.attention_dim, bias=False)
        self.memory_l = torch.nn.Linear(D, hp.attention_dim, bias=False)
        self.v = torch.nn.Linear(hp.attention_dim, 1, bias=False)
        self.loc_conv = torch.nn.Conv1d(
            2, hp.attention_location_n_filters,
            hp.attention_location_kernel_size,
            padding=hp.attention_location_kernel_size // 2, bias=False)
        self.loc_dense = torch.nn.Linear(hp.attention_location_n_filters,
                                         hp.attention_dim, bias=False)
        self.decoder_rnn = torch.nn.LSTMCell(A + D, R)
        self.proj = torch.nn.Linear(R + D, M)
        self.gate = torch.nn.Linear(R + D, 1)
        PK = hp.postnet_kernel_size
        dims = ([M] + [hp.postnet_embedding_dim]
                * (hp.postnet_n_convolutions - 1) + [M])
        self.post_convs = torch.nn.ModuleList(
            [torch.nn.Conv1d(dims[i], dims[i + 1], PK, padding=PK // 2)
             for i in range(hp.postnet_n_convolutions)])
        self.post_bns = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(dims[i + 1])
             for i in range(hp.postnet_n_convolutions)])

    def state_dict_reference_names(self):
        """Rename to the reference checkpoint layout for the converter."""
        sd = {}
        sd["embedding.weight"] = self.embedding.weight
        for i, (c, b) in enumerate(zip(self.enc_convs, self.enc_bns)):
            sd[f"encoder.convolutions.{i}.0.conv.weight"] = c.weight
            sd[f"encoder.convolutions.{i}.0.conv.bias"] = c.bias
            sd[f"encoder.convolutions.{i}.1.weight"] = b.weight
            sd[f"encoder.convolutions.{i}.1.bias"] = b.bias
            sd[f"encoder.convolutions.{i}.1.running_mean"] = b.running_mean
            sd[f"encoder.convolutions.{i}.1.running_var"] = b.running_var
        for suffix in ("", "_reverse"):
            for n in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                sd[f"encoder.lstm.{n}_l0{suffix}"] = getattr(
                    self.lstm, f"{n}_l0{suffix}")
        sd["decoder.prenet.layers.0.linear_layer.weight"] = \
            self.prenet0.weight
        sd["decoder.prenet.layers.1.linear_layer.weight"] = \
            self.prenet1.weight
        for n in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"decoder.attention_rnn.{n}"] = getattr(self.attention_rnn, n)
            sd[f"decoder.decoder_rnn.{n}"] = getattr(self.decoder_rnn, n)
        sd["decoder.attention_layer.query_layer.linear_layer.weight"] = \
            self.query.weight
        sd["decoder.attention_layer.memory_layer.linear_layer.weight"] = \
            self.memory_l.weight
        sd["decoder.attention_layer.v.linear_layer.weight"] = self.v.weight
        sd["decoder.attention_layer.location_layer.location_conv.conv."
           "weight"] = self.loc_conv.weight
        sd["decoder.attention_layer.location_layer.location_dense."
           "linear_layer.weight"] = self.loc_dense.weight
        sd["decoder.linear_projection.linear_layer.weight"] = \
            self.proj.weight
        sd["decoder.linear_projection.linear_layer.bias"] = self.proj.bias
        sd["decoder.gate_layer.linear_layer.weight"] = self.gate.weight
        sd["decoder.gate_layer.linear_layer.bias"] = self.gate.bias
        for i, (c, b) in enumerate(zip(self.post_convs, self.post_bns)):
            sd[f"postnet.convolutions.{i}.0.conv.weight"] = c.weight
            sd[f"postnet.convolutions.{i}.0.conv.bias"] = c.bias
            sd[f"postnet.convolutions.{i}.1.weight"] = b.weight
            sd[f"postnet.convolutions.{i}.1.bias"] = b.bias
            sd[f"postnet.convolutions.{i}.1.running_mean"] = b.running_mean
            sd[f"postnet.convolutions.{i}.1.running_var"] = b.running_var
        return {k: v.detach().numpy() for k, v in sd.items()}

    @torch.no_grad()
    def forward(self, text, mels):
        """Teacher-forced, eval mode, no dropout. mels: (B, M, T_out)."""
        hp = self.hp
        B, T_out = mels.shape[0], mels.shape[2]
        x = self.embedding(text).transpose(1, 2)
        for c, bn in zip(self.enc_convs, self.enc_bns):
            x = F.relu(bn(c(x)))
        memory, _ = self.lstm(x.transpose(1, 2))

        processed_memory = self.memory_l(memory)
        go = torch.zeros(B, hp.n_mel_channels)
        dec_in = torch.cat([go.unsqueeze(2), mels[:, :, :-1]], dim=2)

        attn_h = torch.zeros(B, hp.attention_rnn_dim)
        attn_c = torch.zeros(B, hp.attention_rnn_dim)
        dec_h = torch.zeros(B, hp.decoder_rnn_dim)
        dec_c = torch.zeros(B, hp.decoder_rnn_dim)
        T_in = memory.size(1)
        attn_w = torch.zeros(B, T_in)
        attn_w_cum = torch.zeros(B, T_in)
        context = torch.zeros(B, memory.size(2))

        mel_outs, gate_outs, aligns = [], [], []
        for t in range(T_out):
            frame = dec_in[:, :, t]
            pre = F.relu(self.prenet1(F.relu(self.prenet0(frame))))
            cell_in = torch.cat([pre, context], dim=1)
            attn_h, attn_c = self.attention_rnn(cell_in, (attn_h, attn_c))
            cat = torch.stack([attn_w, attn_w_cum], dim=1)  # (B, 2, T_in)
            loc = self.loc_dense(self.loc_conv(cat).transpose(1, 2))
            energies = self.v(torch.tanh(
                self.query(attn_h).unsqueeze(1) + loc
                + processed_memory)).squeeze(-1)
            attn_w = torch.softmax(energies, dim=1)
            context = torch.bmm(attn_w.unsqueeze(1), memory).squeeze(1)
            attn_w_cum = attn_w_cum + attn_w
            dec_h, dec_c = self.decoder_rnn(
                torch.cat([attn_h, context], dim=1), (dec_h, dec_c))
            hidden = torch.cat([dec_h, context], dim=1)
            mel_outs.append(self.proj(hidden))
            gate_outs.append(self.gate(hidden).squeeze(1))
            aligns.append(attn_w)

        mel = torch.stack(mel_outs, dim=2)  # (B, M, T_out)
        x = mel
        for i, (c, bn) in enumerate(zip(self.post_convs, self.post_bns)):
            x = bn(c(x))
            if i < len(self.post_convs) - 1:
                x = torch.tanh(x)
        return mel, mel + x, torch.stack(gate_outs, 1), torch.stack(aligns, 1)


def test_full_model_parity(monkeypatch):
    hp = tiny_hp()
    torch.manual_seed(0)
    oracle = TorchOracle(hp).eval()
    # Randomize BN running stats so the conversion is actually exercised.
    with torch.no_grad():
        for bn in list(oracle.enc_bns) + list(oracle.post_bns):
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 1.5)

    sd = oracle.state_dict_reference_names()
    params, batch_stats = tacotron2_from_torch(sd, hp)

    # Disable dropout on our side (the oracle has none).
    monkeypatch.setattr(taco_mod, "_dropout", lambda x, r, k: x)

    B, T_in, T_out = 2, 9, 14
    rng = np.random.RandomState(0)
    text = rng.randint(1, hp.n_symbols, (B, T_in)).astype(np.int64)
    mels = rng.randn(B, hp.n_mel_channels, T_out).astype(np.float32)

    t_mel, t_post, t_gate, t_align = oracle(
        torch.from_numpy(text), torch.from_numpy(mels))

    model = Tacotron2(hp)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(text.astype(np.int32)), jnp.full((B,), T_in, jnp.int32),
        jnp.asarray(mels), jnp.zeros((B,), jnp.int32), jnp.zeros((B, 5)),
        jnp.full((B,), T_out, jnp.int32), train=False,
        rngs={"dropout": jax.random.PRNGKey(0),
              "noise": jax.random.PRNGKey(1)})
    j_mel, j_post, j_gate, j_align = out

    mae = np.abs(np.asarray(j_mel) - t_mel.numpy()).mean()
    mae_post = np.abs(np.asarray(j_post) - t_post.numpy()).mean()
    assert mae < 1e-3, f"mel MAE {mae}"
    assert mae_post < 1e-3, f"postnet mel MAE {mae_post}"
    np.testing.assert_allclose(np.asarray(j_gate), t_gate.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_align), t_align.numpy(),
                               atol=1e-3)
