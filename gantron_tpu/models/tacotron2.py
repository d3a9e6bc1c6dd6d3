"""Tacotron2 generator, TPU-native (reference: model.py:15-497, 586-723).

Architecture parity with the reference GANtron generator:
  symbol embedding -> [optional emotion/noise channels] -> conv encoder ->
  BiLSTM -> [optional speaker/emotion memory concat + noise] ->
  autoregressive decoder with location-sensitive attention -> postnet.

TPU-first design choices (vs. the reference's frame-level Python loop,
model.py:444-449):
  * the teacher-forced decoder is ONE ``lax.scan`` over frames; the prenet,
    the prenet->LSTM input projection, the mel projection and the gate layer
    are hoisted out of the scan into large batched MXU matmuls;
  * inference is a fixed-length scan with an on-device gate-threshold stop
    (no per-frame device->host sync, unlike reference model.py:486);
  * all shapes are static; variable lengths are handled by masks.

Activations are channel-last internally; public outputs use the reference's
(B, n_mel, T) layout.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from gantron_tpu.models.modules import (BatchNorm, ConvNorm, dropout,
                                        xavier_uniform)
from gantron_tpu.ops.quant import matmul_rhs, quantize_per_channel
from gantron_tpu.ops.rnn import (LSTMParams, lstm_params_init, masked_bilstm)

N_EMOTIONS = 5
N_SPEAKERS = 123


def get_mask_from_lengths(lengths, max_len):
    """(B,) -> (B, max_len) boolean validity mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


_dropout = dropout  # shared impl, models/modules.py


class ScanWeights(NamedTuple):
    """Weights consumed inside the decoder scan step.

    The big matrices (``wc``/``wh1``/``wq``/``w2ih``/``w2hh``) can enter the
    scan under ``stop_gradient`` (deferred-dW mode): their gradients are then
    reconstructed outside the scan as single batched matmuls from the per-step
    gate cotangents, instead of a per-step read-modify-write of the full f32
    gradient accumulators inside the backward scan (~28% of G-step backward
    HBM traffic at production shapes). ``v``/``loc_kernel``/``b2`` are tiny
    and stay on the normal autodiff path.
    """

    wc: jax.Array          # attention_rnn.w_ih[prenet_dim:] (context rows)
    wh1: jax.Array         # attention_rnn.w_hh
    wq: jax.Array          # query_w
    v: jax.Array           # v_w
    loc_kernel: jax.Array  # merged location conv+dense kernel
    w2ih: jax.Array        # decoder_rnn.w_ih
    w2hh: jax.Array        # decoder_rnn.w_hh
    b2: jax.Array          # decoder_rnn.b


class Encoder(nn.Module):
    """3 conv layers + BiLSTM (reference model.py:154-224)."""

    hp: object

    @nn.compact
    def __call__(self, x, input_lengths, train: bool, dropout_rng,
                 mask=None):
        """``mask``: optional (B, T) validity mask. The TRAINING path leaves
        it None — the reference's convs see pad-symbol embeddings
        (model.py:216-222 packs only the LSTM), and teacher-forced parity
        depends on matching that. INFERENCE on padded batches passes the
        mask so activations at pad positions are zeroed before every conv:
        valid outputs then see only zeros beyond each sample's length
        (exactly SAME-padding of the unpadded text), making serving decodes
        invariant to the padding amount."""
        hp = self.hp
        for i in range(hp.encoder_n_convolutions):
            if mask is not None:
                # Re-applied per layer: conv bias + BN shift re-populate pad
                # positions after each conv.
                x = jnp.where(mask[..., None], x, 0.0)
            x = ConvNorm(hp.encoder_embedding_dim,
                         kernel_size=hp.encoder_kernel_size, gain="relu",
                         name=f"conv_{i}")(x)
            x = BatchNorm(name=f"bn_{i}")(x, train)
            x = jax.nn.relu(x)
            if train:
                dropout_rng, sub = jax.random.split(dropout_rng)
                x = _dropout(x, 0.5, sub)

        H = hp.encoder_embedding_dim // 2
        fw = self.param("lstm_fw",
                        lambda k: lstm_params_init(k, hp.encoder_embedding_dim, H))
        bw = self.param("lstm_bw",
                        lambda k: lstm_params_init(k, hp.encoder_embedding_dim, H))
        return masked_bilstm(LSTMParams(*fw), LSTMParams(*bw), x, input_lengths,
                             unroll=min(4, getattr(hp, 'scan_unroll', 1)))


class Postnet(nn.Module):
    """5 conv layers refining the mel (reference model.py:108-151)."""

    hp: object

    @nn.compact
    def __call__(self, x, train: bool, dropout_rng):
        hp = self.hp
        n = hp.postnet_n_convolutions
        for i in range(n):
            last = i == n - 1
            feats = hp.n_mel_channels if last else hp.postnet_embedding_dim
            gain = "linear" if last else "tanh"
            x = ConvNorm(feats, kernel_size=hp.postnet_kernel_size, gain=gain,
                         name=f"conv_{i}")(x)
            x = BatchNorm(name=f"bn_{i}")(x, train)
            if not last:
                x = jnp.tanh(x)
            if train:
                dropout_rng, sub = jax.random.split(dropout_rng)
                x = _dropout(x, 0.5, sub)
        return x


class StyleEncoder(nn.Module):
    """InfoGAN-style identification head: free-running mel -> predicted
    style/noise vector in (0, 1).

    No reference counterpart — the reference injects a uniform latent
    (model.py:184-191, 273-279) but its training scheme never asks the
    latent to carry information (train.py:371-383 scores only teacher-forced
    outputs, where the forced history determines the mode), and measurement
    shows the latent stays functionally dead (docs/TRAINING_EVIDENCE.md).
    Reconstructing the injected style from the ROLLOUT mel is a variational
    lower bound on I(style; mel) — the standard InfoGAN Q head — and its
    gradient reaches the generator through the differentiable rollout scan.

    Two strided convs + masked mean-pool + dense; sigmoid output matches the
    uniform-(0,1) style prior. Deliberately small: it only needs to read a
    global texture statistic, and it rides along every rollout G step.
    """

    hp: object
    out_dim: int

    @nn.compact
    def __call__(self, mel_bmt, lengths):
        """(B, n_mel, T) mel + (B,) valid frame lengths -> (B, out_dim)."""
        hp = self.hp
        D = max(hp.n_mel_channels, 128)
        x = mel_bmt.transpose(0, 2, 1)  # (B, T, n_mel), channel-last
        x = nn.Conv(D, kernel_size=(5,), strides=(2,), padding="SAME",
                    name="conv_0")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(D, kernel_size=(5,), strides=(2,), padding="SAME",
                    name="conv_1")(x)
        x = jax.nn.relu(x)
        # Masked mean over the valid (stride-4 downsampled) frames: rollout
        # lengths are gate-decided per sample, and frames past the stop are
        # zero — they must not dilute the pooled statistic.
        T4 = x.shape[1]
        valid = get_mask_from_lengths((lengths + 3) // 4, T4)  # (B, T4)
        denom = jnp.maximum(valid.sum(axis=1, keepdims=True), 1)
        pooled = (x * valid[..., None]).sum(axis=1) / denom
        return jax.nn.sigmoid(nn.Dense(self.out_dim, name="out")(pooled))


class Decoder(nn.Module):
    """Autoregressive mel decoder with location-sensitive attention
    (reference model.py:227-497), implemented as a single lax.scan."""

    hp: object
    memory_dim: int  # encoder output dim + all conditioning concats

    def setup(self):
        hp = self.hp
        D = self.memory_dim
        P, A, R, M = (hp.prenet_dim, hp.attention_rnn_dim, hp.decoder_rnn_dim,
                      hp.n_mel_channels)
        # n_frames_per_step=k emits k mel frames per recurrence step — the
        # reference declares it (hparams.py:71, model.py:248-267) but only
        # supports 1; here it is a first-class throughput lever (k x fewer
        # sequential scan steps, the dominant cost on TPU).
        K = getattr(hp, "n_frames_per_step", 1)
        xavier = xavier_uniform
        self.prenet_w0 = self.param("prenet_w0", xavier("linear"), (M * K, P))
        self.prenet_w1 = self.param("prenet_w1", xavier("linear"), (P, P))
        self.attention_rnn = LSTMParams(*self.param(
            "attention_rnn", lambda k: lstm_params_init(k, P + D, A)))
        self.query_w = self.param("query_w", xavier("tanh"),
                                  (A, hp.attention_dim))
        self.memory_w = self.param("memory_w", xavier("tanh"),
                                   (D, hp.attention_dim))
        self.v_w = self.param("v_w", xavier("linear"), (hp.attention_dim, 1))
        self.loc_conv_w = self.param(
            "loc_conv_w", xavier("linear"),
            (hp.attention_location_kernel_size, 2,
             hp.attention_location_n_filters))
        self.loc_dense_w = self.param(
            "loc_dense_w", xavier("tanh"),
            (hp.attention_location_n_filters, hp.attention_dim))
        self.decoder_rnn = LSTMParams(*self.param(
            "decoder_rnn", lambda k: lstm_params_init(k, A + D, R)))
        self.proj_w = self.param("proj_w", xavier("linear"), (R + D, M * K))
        self.proj_b = self.param("proj_b", nn.initializers.zeros, (M * K,))
        self.gate_w = self.param("gate_w", xavier("sigmoid"), (R + D, 1))
        self.gate_b = self.param("gate_b", nn.initializers.zeros, (1,))

    # -- pieces -------------------------------------------------------------
    def _prenet(self, x, key):
        k0, k1 = jax.random.split(key)
        x = _dropout(jax.nn.relu(x @ self.prenet_w0), 0.5, k0)
        x = _dropout(jax.nn.relu(x @ self.prenet_w1), 0.5, k1)
        return x

    def _merged_location_kernel(self):
        """Compose location_conv (31,2,F) with location_dense (F,att) into a
        single conv kernel (31,2,att): both are linear, so one conv replaces
        conv+matmul inside the scan (fewer per-step ops and residuals)."""
        return jnp.einsum("kcf,fa->kca", self.loc_conv_w, self.loc_dense_w)

    def _scan_weights(self, stop_big: bool = False,
                      quantize: bool = False) -> ScanWeights:
        """Bundle the in-scan weights; ``stop_big=True`` detaches the five
        large matrices for deferred-dW training (values are unchanged).

        ``quantize=True`` stores the four large recurrence matrices as
        per-channel int8 (ops/quant.py): the decoder's sequential steps are
        HBM-bound on streaming exactly these weights, so int8 halves the
        per-step floor. Opt-in serving lever (``hp.quantized_inference``)."""
        P = self.hp.prenet_dim
        sg = jax.lax.stop_gradient if stop_big else (lambda x: x)
        big = ((lambda w: quantize_per_channel(sg(w))) if quantize
               else (lambda w: sg(w)))
        return ScanWeights(
            wc=big(self.attention_rnn.w_ih[P:]),
            wh1=big(self.attention_rnn.w_hh),
            wq=sg(self.query_w),
            v=self.v_w,
            loc_kernel=self._merged_location_kernel(),
            w2ih=big(self.decoder_rnn.w_ih),
            w2hh=big(self.decoder_rnn.w_hh),
            b2=self.decoder_rnn.b)

    def _location(self, attn_w, attn_w_cum, loc_kernel):
        cat = jnp.stack([attn_w, attn_w_cum], axis=-1)  # (B, T_in, 2)
        return jax.lax.conv_general_dilated(
            cat, loc_kernel, window_strides=(1,),
            padding=[(self.hp.attention_location_kernel_size // 2,) * 2],
            dimension_numbers=("NWC", "WIO", "NWC"))

    def _attend(self, attn_h, memory, processed_memory, attn_w, attn_w_cum,
                mask, W: ScanWeights, zq=None):
        processed_query = attn_h @ W.wq  # (B, att)
        if zq is not None:
            processed_query = processed_query + zq
        processed_query = processed_query[:, None]  # (B, 1, att)
        processed_loc = self._location(attn_w, attn_w_cum, W.loc_kernel)
        energies = jnp.tanh(processed_query + processed_loc
                            + processed_memory) @ W.v  # (B, T_in, 1)
        energies = energies[..., 0]
        if mask is not None:
            energies = jnp.where(mask, energies, -jnp.inf)
        weights = jax.nn.softmax(energies, axis=1)
        context = jnp.einsum("bt,btd->bd", weights, memory)
        return context, weights

    def _init_state(self, memory):
        B, T_in, _ = memory.shape
        hp = self.hp
        z = lambda *s: jnp.zeros(s, memory.dtype)
        return (z(B, hp.attention_rnn_dim), z(B, hp.attention_rnn_dim),
                z(B, hp.decoder_rnn_dim), z(B, hp.decoder_rnn_dim),
                z(B, T_in), z(B, T_in), z(B, self.memory_dim))

    def _step_core(self, carry, attn_in_proj, key, memory, processed_memory,
                   mask, train, W: ScanWeights, z1=None, z2=None, zq=None):
        """Shared per-frame math. ``attn_in_proj`` = prenet_t @ w_ih[:P] + b.

        ``z1``/``z2``/``zq`` are optional zero-valued gate offsets used by the
        deferred-dW training path: adding a runtime zero is numerically exact
        (even in bf16), and the cotangent of each offset IS that step's gate
        gradient, which autodiff then emits as a cheap per-step scan output
        instead of accumulating the full dW matrices step by step.
        """
        attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, context = carry
        gates = (attn_in_proj + matmul_rhs(context, W.wc)
                 + matmul_rhs(attn_h, W.wh1))
        if z1 is not None:
            gates = gates + z1
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        attn_c = jax.nn.sigmoid(f) * attn_c + jax.nn.sigmoid(i) * jnp.tanh(g)
        attn_h = jax.nn.sigmoid(o) * jnp.tanh(attn_c)
        k0, k1 = jax.random.split(key)
        if train and self.hp.p_attention_dropout > 0:
            attn_h = _dropout(attn_h, self.hp.p_attention_dropout, k0)

        context, attn_w_new = self._attend(attn_h, memory, processed_memory,
                                           attn_w, attn_w_cum, mask, W, zq)
        attn_w_cum = attn_w_cum + attn_w_new

        dec_in = jnp.concatenate([attn_h, context], axis=-1)
        gates2 = (matmul_rhs(dec_in, W.w2ih) + matmul_rhs(dec_h, W.w2hh)
                  + W.b2)
        if z2 is not None:
            gates2 = gates2 + z2
        i, f, g, o = jnp.split(gates2, 4, axis=-1)
        dec_c = jax.nn.sigmoid(f) * dec_c + jax.nn.sigmoid(i) * jnp.tanh(g)
        dec_h = jax.nn.sigmoid(o) * jnp.tanh(dec_c)
        if train and self.hp.p_decoder_dropout > 0:
            dec_h = _dropout(dec_h, self.hp.p_decoder_dropout, k1)

        carry = (attn_h, attn_c, dec_h, dec_c, attn_w_new, attn_w_cum, context)
        return carry

    # -- teacher-forced training pass ---------------------------------------
    def __call__(self, memory, mels, memory_lengths, train: bool,
                 dropout_rng, dw_offsets=None):
        """memory: (B, T_in, D); mels: (B, n_mel, T_out) ground truth.

        ``dw_offsets``: optional dict of zero-valued per-step gate offsets
        {"z1": (steps, B, 4*attention_rnn_dim), "z2": (steps, B,
        4*decoder_rnn_dim), "zq": (steps, B, attention_dim)} enabling the
        deferred-dW backward (see ScanWeights). When given, the big in-scan
        weights are detached and a fourth return value carries the per-step
        activations needed to rebuild their gradients post-scan.

        Returns (mel_outputs (B, n_mel, T_out), gate_outputs (B, T_out),
        alignments (B, T_out, T_in)) [, dw_aux].
        """
        hp = self.hp
        B, T_in, _ = memory.shape
        T_out = mels.shape[2]
        K = getattr(hp, "n_frames_per_step", 1)
        assert T_out % K == 0, "collate pads T_out to an n_frames multiple"
        steps = T_out // K
        mask = get_mask_from_lengths(memory_lengths, T_in)
        processed_memory = memory @ self.memory_w
        W = self._scan_weights(stop_big=dw_offsets is not None)

        # Teacher-forced inputs: go group + all-but-last K-frame groups
        # (reference parse_decoder_inputs, model.py:329-347).
        groups = mels.transpose(0, 2, 1).reshape(B, steps,
                                                 K * hp.n_mel_channels)
        frames = jnp.concatenate(
            [jnp.zeros((B, 1, K * hp.n_mel_channels), mels.dtype),
             groups[:, :-1]], axis=1).transpose(1, 0, 2)  # (steps, B, K*M)

        # Prenet + attention-RNN input projection, hoisted out of the scan.
        k_pre, k_scan = jax.random.split(dropout_rng)
        prenet_out = self._prenet(frames, k_pre)  # (steps, B, P)
        P = hp.prenet_dim
        attn_in_proj = (prenet_out @ self.attention_rnn.w_ih[:P]
                        + self.attention_rnn.b)  # (steps, B, 4A)

        keys = jax.random.split(k_scan, steps)

        if dw_offsets is None:
            xs = (attn_in_proj, keys, None, None, None)
        else:
            xs = (attn_in_proj, keys, dw_offsets["z1"], dw_offsets["z2"],
                  dw_offsets["zq"])

        def step(carry, xs):
            proj_t, key_t, z1_t, z2_t, zq_t = xs
            carry = self._step_core(carry, proj_t, key_t, memory,
                                    processed_memory, mask, train, W,
                                    z1_t, z2_t, zq_t)
            attn_h, dec_h, context, attn_w = (carry[0], carry[2], carry[6],
                                              carry[4])
            return carry, (attn_h, dec_h, context, attn_w)

        _, (attn_hs, dec_hs, contexts, attn_ws) = jax.lax.scan(
            step, self._init_state(memory), xs,
            unroll=getattr(self.hp, "scan_unroll", 1))

        # Output projections hoisted: (steps, B, R + D) in two big matmuls.
        hidden_ctx = jnp.concatenate([dec_hs, contexts], axis=-1)
        mel_out = hidden_ctx @ self.proj_w + self.proj_b  # (steps, B, K*M)
        gate_out = (hidden_ctx @ self.gate_w + self.gate_b)[..., 0]  # (S,B)

        mel_bmt = mel_out.transpose(1, 0, 2).reshape(
            B, T_out, hp.n_mel_channels).transpose(0, 2, 1)
        # Gate energies repeat over each step's K frames so the loss and
        # parse_output masking stay frame-level for every K.
        gate_bt = jnp.repeat(gate_out.T, K, axis=1)
        outs = (mel_bmt, gate_bt, attn_ws.transpose(1, 0, 2))
        if dw_offsets is None:
            return outs
        # Per-step activations for the post-scan dW matmuls. Values only —
        # gradients must not flow back through this side channel.
        dw_aux = jax.lax.stop_gradient(
            dict(attn_hs=attn_hs, dec_hs=dec_hs, contexts=contexts))
        return outs + (dw_aux,)

    # -- free-running inference ---------------------------------------------
    def _open_step(self, carry, k_pre, k_core, memory, processed_memory, W,
                   mask=None):
        """ONE open-loop decoder step — the shared body of ``infer``
        (scan), ``infer_early_exit`` (while_loop) and ``infer_segment``
        (streaming). Callers differ only in how they derive the per-step
        dropout keys and where they put the outputs; keeping a single body
        guarantees the three decode modes cannot drift.

        ``mask``: optional (B, T_in) attention validity mask. Serving decodes
        pass None (a single unpadded text); free-running adversarial
        rollouts decode PADDED training batches and must not attend to pad
        symbols.

        carry: (state, prev_frame, finished, length, t). Returns
        (next_carry, (mel_rec, gate_t, attn_w)) where ``mel_rec`` has frames
        past each sample's stop zeroed so the postnet sees the same zero
        context as the reference's length-n buffer (model.py:478-497 stops
        producing frames at the gate).
        """
        hp = self.hp
        P = hp.prenet_dim
        state, prev, finished, length, t = carry
        prenet_t = self._prenet(prev, k_pre)
        proj_t = prenet_t @ self.attention_rnn.w_ih[:P] + self.attention_rnn.b
        state = self._step_core(state, proj_t, k_core, memory,
                                processed_memory, mask, False, W)
        dec_h, context, attn_w = state[2], state[6], state[4]
        hidden_ctx = jnp.concatenate([dec_h, context], axis=-1)
        mel_t = hidden_ctx @ self.proj_w + self.proj_b
        gate_t = (hidden_ctx @ self.gate_w + self.gate_b)[..., 0]

        stop_now = jax.nn.sigmoid(gate_t) > hp.gate_threshold
        newly = jnp.logical_and(stop_now, jnp.logical_not(finished))
        length = jnp.where(newly, t + 1, length)
        mel_rec = jnp.where(finished[:, None], 0.0, mel_t)
        finished = jnp.logical_or(finished, stop_now)
        return ((state, mel_t, finished, length, t + 1),
                (mel_rec, gate_t, attn_w))

    def infer(self, memory, dropout_rng, max_steps: Optional[int] = None,
              memory_lengths=None):
        """Open-loop decoding with on-device gate stopping.

        ``memory_lengths``: optional (B,) valid memory lengths — pass for
        PADDED batches (adversarial rollouts) so attention masks pad
        positions exactly as the teacher-forced pass does.

        Returns (mel_outputs (B, n_mel, S), gate_outputs (B, S),
        alignments (B, S, T_in), mel_lengths (B,)) where S = max_steps.
        """
        hp = self.hp
        B, T_in, _ = memory.shape
        S = max_steps or hp.max_decoder_steps
        K = getattr(hp, "n_frames_per_step", 1)
        processed_memory = memory @ self.memory_w
        W = self._scan_weights(
            quantize=getattr(hp, "quantized_inference", False))
        mask = (get_mask_from_lengths(memory_lengths, T_in)
                if memory_lengths is not None else None)

        keys = jax.random.split(dropout_rng, S)
        state0 = self._init_state(memory)
        prev0 = jnp.zeros((B, K * hp.n_mel_channels), memory.dtype)
        finished0 = jnp.zeros((B,), bool)
        length0 = jnp.full((B,), S, jnp.int32)

        def step(carry, key_t):
            k_pre, k_core = jax.random.split(key_t)
            return self._open_step(carry, k_pre, k_core, memory,
                                   processed_memory, W, mask)

        (_, _, _, lengths, _), (mels, gates, attn_ws) = jax.lax.scan(
            step, (state0, prev0, finished0, length0, jnp.int32(0)), keys,
            unroll=getattr(self.hp, "scan_unroll", 1))

        # (S, B, K*M) -> (B, M, S*K); step-level gates/lengths -> frame-level.
        mel_bmt = mels.transpose(1, 0, 2).reshape(
            B, S * K, hp.n_mel_channels).transpose(0, 2, 1)
        return (mel_bmt, jnp.repeat(gates.T, K, axis=1),
                attn_ws.transpose(1, 0, 2), lengths * K)

    # -- streaming inference -------------------------------------------------
    def infer_init(self, memory, cap: int):
        """Initial carry for segmented (streaming) decoding: the same layout
        the ``infer`` scan carries, with ``length`` defaulting to the overall
        decoder cap."""
        hp = self.hp
        B = memory.shape[0]
        K = getattr(hp, "n_frames_per_step", 1)
        return (self._init_state(memory),
                jnp.zeros((B, K * hp.n_mel_channels), memory.dtype),
                jnp.zeros((B,), bool),
                jnp.full((B,), cap, jnp.int32),
                jnp.int32(0))

    def infer_segment(self, memory, carry, dropout_rng, n_steps: int,
                      memory_lengths=None):
        """Run ``n_steps`` decoder steps from ``carry`` (streaming synthesis:
        the caller vocodes each mel segment while the next one decodes,
        giving time-to-first-audio ~ one segment instead of the full
        utterance). Per-step dropout keys derive from the absolute step index
        (``fold_in(rng, t)``) so the decode stream is invariant to the
        segment size.

        ``memory_lengths``: optional (B,) valid memory lengths — pass for
        PADDED streaming batches so attention masks pad positions (same
        semantics as ``infer``).

        Returns (carry, mel (B, n_mel, n_steps*K), gate (B, n_steps*K),
        attn (B, n_steps, T_in), lengths (B,), all_finished ()).
        """
        hp = self.hp
        B, T_in, _ = memory.shape
        K = getattr(hp, "n_frames_per_step", 1)
        processed_memory = memory @ self.memory_w
        W = self._scan_weights(
            quantize=getattr(hp, "quantized_inference", False))
        mask = (get_mask_from_lengths(memory_lengths, T_in)
                if memory_lengths is not None else None)

        def step(scarry, _):
            # Keys derive from the ABSOLUTE step index so the decode stream
            # is invariant to the segment size.
            k_pre, k_core = jax.random.split(
                jax.random.fold_in(dropout_rng, scarry[4]))
            return self._open_step(scarry, k_pre, k_core, memory,
                                   processed_memory, W, mask)

        carry, (mels, gates, attn_ws) = jax.lax.scan(
            step, carry, None, length=n_steps,
            unroll=getattr(self.hp, "scan_unroll", 1))
        mel_bmt = mels.transpose(1, 0, 2).reshape(
            B, n_steps * K, hp.n_mel_channels).transpose(0, 2, 1)
        lengths = carry[3]
        return (carry, mel_bmt, jnp.repeat(gates.T, K, axis=1),
                attn_ws.transpose(1, 0, 2), lengths * K,
                jnp.all(carry[2]))

    def infer_early_exit(self, memory, dropout_rng,
                         max_steps: Optional[int] = None,
                         memory_lengths=None):
        """Like ``infer`` but with a ``lax.while_loop`` that stops as soon as
        every sequence's gate fires — synthesis latency scales with the
        *actual* utterance length instead of the decoder cap. Outputs are
        written into preallocated (B, n_mel, S) buffers; frames past each
        stop point are zero.

        ``memory_lengths``: optional (B,) valid memory lengths — pass for
        PADDED batches so attention masks pad positions (same semantics as
        ``infer``).
        """
        hp = self.hp
        B, T_in, _ = memory.shape
        S = max_steps or hp.max_decoder_steps
        K = getattr(hp, "n_frames_per_step", 1)
        processed_memory = memory @ self.memory_w
        W = self._scan_weights(
            quantize=getattr(hp, "quantized_inference", False))
        mask = (get_mask_from_lengths(memory_lengths, T_in)
                if memory_lengths is not None else None)

        state0 = self._init_state(memory)
        # Same per-step key derivation as the scan path so both modes
        # produce identical decodes for a given rng.
        keys = jax.random.split(dropout_rng, S)
        mels0 = jnp.zeros((S, B, K * hp.n_mel_channels), memory.dtype)
        gates0 = jnp.zeros((S, B), memory.dtype)
        attn0 = jnp.zeros((S, B, T_in), memory.dtype)
        prev0 = jnp.zeros((B, K * hp.n_mel_channels), memory.dtype)
        finished0 = jnp.zeros((B,), bool)
        length0 = jnp.full((B,), S, jnp.int32)

        def cond(carry):
            _, _, finished, _, t, *_ = carry
            return jnp.logical_and(t < S, ~jnp.all(finished))

        def body(carry):
            state, prev, finished, length, t, mels, gates, attns = carry
            k_pre, k_core = jax.random.split(keys[t])
            ((state, prev, finished, length, t1),
             (mel_rec, gate_t, attn_w)) = self._open_step(
                (state, prev, finished, length, t), k_pre, k_core, memory,
                processed_memory, W, mask)
            mels = mels.at[t].set(mel_rec)
            gates = gates.at[t].set(gate_t)
            attns = attns.at[t].set(attn_w)
            return (state, prev, finished, length, t1, mels, gates, attns)

        (_, _, _, lengths, _, mels, gates, attns) = jax.lax.while_loop(
            cond, body, (state0, prev0, finished0, length0, jnp.int32(0),
                         mels0, gates0, attn0))
        mel_bmt = mels.transpose(1, 0, 2).reshape(
            B, S * K, hp.n_mel_channels).transpose(0, 2, 1)
        return (mel_bmt, jnp.repeat(gates.T, K, axis=1),
                attns.transpose(1, 0, 2), lengths * K)


class Tacotron2(nn.Module):
    """GANtron generator (reference model.py:586-723)."""

    hp: object

    @property
    def use_labels(self) -> bool:
        return bool(self.hp.use_labels and self.hp.vesus_path)

    @property
    def noise_size(self) -> int:
        return self.hp.noise_size if self.hp.use_noise else 0

    @property
    def style_reconstruction(self) -> bool:
        return (getattr(self.hp, "style_reconstruction_weight", 0.0) > 0
                and self.noise_size > 0)

    @property
    def style_code_dims(self) -> int:
        """Identifiable-code width: the first style_code_dims dims of the
        style vector are the InfoGAN code the Q head reconstructs; 0 means
        the whole vector is the code (config.py style_code_dims)."""
        return (int(getattr(self.hp, "style_code_dims", 0))
                or self.noise_size)

    @property
    def memory_dim(self) -> int:
        """Decoder-side memory width after all concats
        (reference model.py:240-246)."""
        hp = self.hp
        d = hp.encoder_embedding_dim
        if not hp.encoder_inputs:
            d += self.noise_size
        if hp.vesus_path:
            d += hp.speakers_embedding
            if self.use_labels and not hp.encoder_inputs:
                d += N_EMOTIONS
        return d

    def setup(self):
        hp = self.hp
        std = np.sqrt(2.0 / (hp.n_symbols + hp.symbols_embedding_dim))
        val = np.sqrt(3.0) * std
        # NOTE: the speaker embedding below reuses the SYMBOL table's
        # uniform bound — that matches the reference exactly
        # (model.py:603-611 applies the same `val` to both embeddings).
        self.embedding = self.param(
            "embedding",
            lambda k: jax.random.uniform(
                k, (hp.n_symbols, hp.symbols_embedding_dim), jnp.float32,
                -val, val))
        if hp.vesus_path:
            self.speaker_embedding = self.param(
                "speaker_embedding",
                lambda k: jax.random.uniform(
                    k, (N_SPEAKERS, hp.speakers_embedding), jnp.float32,
                    -val, val))
        self.encoder = Encoder(hp, name="encoder")
        self.decoder = Decoder(hp, self.memory_dim, name="decoder")
        self.postnet = Postnet(hp, name="postnet")
        if self.style_reconstruction:
            self.style_encoder = StyleEncoder(hp, self.style_code_dims,
                                              name="style_encoder")

    # -- conditioning plumbing ----------------------------------------------
    def _encoder_side_concat(self, embedded, emotions, noise_rng, style):
        """Emotion/noise channels appended to the conv stack input
        (reference model.py:184-191, 649-651) when encoder_inputs=True."""
        hp = self.hp
        B, T = embedded.shape[:2]
        dtype = embedded.dtype
        parts = [embedded]
        if hp.encoder_inputs and self.use_labels and emotions is not None:
            parts.append(jnp.broadcast_to(emotions[:, None, :].astype(dtype),
                                          (B, T, N_EMOTIONS)))
        if hp.encoder_inputs and self.noise_size > 0:
            if style is None:
                style = jax.random.uniform(noise_rng, (B, 1, self.noise_size),
                                           dtype=dtype)
            parts.append(jnp.broadcast_to(style.astype(dtype),
                                          (B, T, self.noise_size)))
        return jnp.concatenate(parts, -1) if len(parts) > 1 else embedded

    def _memory_side_concat(self, encoder_outputs, speaker_ids, emotions,
                            noise_rng, style):
        """Speaker/emotion/noise concat to decoder memory
        (reference model.py:273-279, 655-663)."""
        hp = self.hp
        B, T = encoder_outputs.shape[:2]
        dtype = encoder_outputs.dtype
        parts = [encoder_outputs]
        if hp.vesus_path:
            spk = jnp.take(self.speaker_embedding, speaker_ids, axis=0)
            parts.append(jnp.broadcast_to(spk[:, None, :].astype(dtype),
                                          (B, T, hp.speakers_embedding)))
            if self.use_labels and not hp.encoder_inputs and emotions is not None:
                parts.append(jnp.broadcast_to(emotions[:, None, :].astype(dtype),
                                              (B, T, N_EMOTIONS)))
        if not hp.encoder_inputs and self.noise_size > 0:
            if style is None:
                style = jax.random.uniform(noise_rng, (B, 1, self.noise_size),
                                           dtype=dtype)
            parts.append(jnp.broadcast_to(style.astype(dtype),
                                          (B, T, self.noise_size)))
        return jnp.concatenate(parts, -1) if len(parts) > 1 else encoder_outputs

    # -- training forward ---------------------------------------------------
    def __call__(self, text, text_lengths, mels, speaker_ids, emotions,
                 output_lengths, train: bool = True, style=None,
                 dw_offsets=None):
        """Teacher-forced forward (reference model.py:644-673).

        ``style``: optional (B, 1, noise_size) noise overriding the internal
        uniform draw — used for deterministic parity against the reference's
        ``torch.rand`` sites (model.py:187, 275) and reproducible training.

        ``dw_offsets``: optional zero-valued gate offsets enabling the
        decoder's deferred-dW backward (see Decoder.__call__); when given the
        return value is (outputs, dw_aux).

        Returns [mel_outputs, mel_outputs_postnet, gate_outputs, alignments]
        with padded frames masked (mel -> 0, gate energy -> 1e3).
        """
        hp = self.hp
        noise_rng = (self.make_rng("noise")
                     if self.noise_size > 0 and style is None else None)
        dropout_rng = self.make_rng("dropout")
        k_enc, k_dec, k_post = jax.random.split(dropout_rng, 3)
        k_noise_enc = k_noise_mem = None
        if noise_rng is not None:
            k_noise_enc, k_noise_mem = jax.random.split(noise_rng)

        embedded = jnp.take(self.embedding, text, axis=0)  # (B, T, 512)
        embedded = self._encoder_side_concat(
            embedded, emotions, k_noise_enc,
            style if hp.encoder_inputs else None)
        encoder_outputs = self.encoder(embedded, text_lengths, train, k_enc)
        memory = self._memory_side_concat(
            encoder_outputs, speaker_ids, emotions, k_noise_mem,
            None if hp.encoder_inputs else style)

        dec_out = self.decoder(memory, mels, text_lengths, train, k_dec,
                               dw_offsets=dw_offsets)
        mel_outputs, gate_outputs, alignments = dec_out[:3]

        post = self.postnet(mel_outputs.transpose(0, 2, 1), train, k_post)
        mel_outputs_postnet = mel_outputs + post.transpose(0, 2, 1)

        outputs = self.parse_output(
            [mel_outputs, mel_outputs_postnet, gate_outputs, alignments],
            output_lengths)
        if dw_offsets is None:
            return outputs
        return outputs, dec_out[3]

    def predict_style(self, mel_bmt, lengths):
        """InfoGAN Q head: free-running mel (B, n_mel, T) + valid frame
        lengths (B,) -> predicted style CODE (B, style_code_dims) in (0, 1)
        — the first style_code_dims dims of the injected style vector
        (the whole vector when hp.style_code_dims == 0). Only available
        with ``hp.style_reconstruction_weight > 0``."""
        return self.style_encoder(mel_bmt, lengths)

    def init_full(self, text, text_lengths, mels, speaker_ids, emotions,
                  output_lengths, train: bool = False):
        """Initialization-only forward touching EVERY submodule: linen
        creates a submodule's params at first call, and the style encoder
        (when enabled) runs only in the rollout G step — without this, a
        template built from the teacher-forced ``__call__`` alone would lack
        its params and every subsequent apply/restore would fail."""
        out = self(text, text_lengths, mels, speaker_ids, emotions,
                   output_lengths, train=train)
        if self.style_reconstruction:
            self.predict_style(mels, output_lengths)
        return out

    def parse_output(self, outputs, output_lengths=None):
        """Mask padded frames (reference model.py:632-642)."""
        if self.hp.mask_padding and output_lengths is not None:
            T_out = outputs[0].shape[2]
            valid = get_mask_from_lengths(output_lengths, T_out)  # (B, T)
            outputs[0] = jnp.where(valid[:, None, :], outputs[0], 0.0)
            outputs[1] = jnp.where(valid[:, None, :], outputs[1], 0.0)
            outputs[2] = jnp.where(valid, outputs[2], 1e3)
        return outputs

    # -- inference ----------------------------------------------------------
    def encode_memory(self, text, style=None, emotions=None, speaker=None,
                      text_lengths=None):
        """Text -> decoder memory with all conditioning concats applied (the
        first half of ``infer``; also the setup step of streaming synthesis).
        ``text_lengths``: optional true lengths for PADDED batches
        (adversarial rollouts); serving passes a single unpadded text and
        leaves it None. Returns (memory, k_dec, k_post) — the decode/postnet
        dropout keys derived from this call's rng stream."""
        hp = self.hp
        B, T = text.shape
        dropout_rng = self.make_rng("dropout")
        noise_rng = (self.make_rng("noise") if
                     (self.noise_size > 0 and style is None)
                     or (self.use_labels and emotions is None)
                     else None)

        if self.use_labels and emotions is None:
            noise_rng, sub = jax.random.split(noise_rng)
            emotions = jax.random.uniform(sub, (B, N_EMOTIONS))

        k_enc, k_dec, k_post = jax.random.split(dropout_rng, 3)
        enc_style = style if hp.encoder_inputs else None
        mem_style = None if hp.encoder_inputs else style
        if style is not None and style.ndim == 3 and style.shape[1] not in (1, T):
            raise ValueError("style must broadcast over input positions")

        embedded = jnp.take(self.embedding, text, axis=0)
        embedded = self._encoder_side_concat(embedded, emotions, noise_rng,
                                             enc_style)
        lengths = (text_lengths if text_lengths is not None
                   else jnp.full((B,), T, jnp.int32))
        # Inference-only conv masking (see Encoder.__call__): with true
        # lengths given, a padded batch's memory at valid positions is
        # bit-identical to the same texts under any padding amount.
        enc_mask = (get_mask_from_lengths(lengths, T)
                    if text_lengths is not None else None)
        encoder_outputs = self.encoder(embedded, lengths, False, k_enc,
                                       mask=enc_mask)

        spk = speaker if speaker is not None else jnp.zeros((B,), jnp.int32)
        memory = self._memory_side_concat(encoder_outputs, spk,
                                          None if hp.encoder_inputs else emotions,
                                          noise_rng, mem_style)
        return memory, k_dec, k_post

    def infer(self, text, style=None, emotions=None, speaker=None,
              max_steps: Optional[int] = None, early_exit: bool = False,
              text_lengths=None):
        """Open-loop inference (reference model.py:675-723).

        ``text``: (B, T) int32 symbol ids. ``style``: optional (B, 1, noise)
        or (B, T, noise). ``text_lengths``: optional true lengths when
        ``text`` is a padded batch (adversarial rollouts) — masks encoder
        state and attention at pad positions. Returns [mel, mel_postnet,
        gate, alignments, mel_lengths].
        """
        memory, k_dec, k_post = self.encode_memory(text, style, emotions,
                                                   speaker, text_lengths)
        if early_exit:
            mel_outputs, gate_outputs, alignments, mel_lengths = \
                self.decoder.infer_early_exit(memory, k_dec, max_steps,
                                              memory_lengths=text_lengths)
        else:
            mel_outputs, gate_outputs, alignments, mel_lengths = \
                self.decoder.infer(memory, k_dec, max_steps,
                                   memory_lengths=text_lengths)

        post = self.postnet(mel_outputs.transpose(0, 2, 1), False, k_post)
        mel_outputs_postnet = mel_outputs + post.transpose(0, 2, 1)

        return [mel_outputs, mel_outputs_postnet, gate_outputs, alignments,
                mel_lengths]

    def decode_segment(self, memory, carry, n_steps: int, seg_rng=None,
                       memory_lengths=None):
        """Streaming: advance the decoder ``n_steps`` from ``carry`` (see
        ``Decoder.infer_segment``). ``seg_rng`` defaults to this call's
        ``dropout`` rng; pass the k_dec from ``encode_memory`` for a decode
        stream independent of segmentation. ``memory_lengths``: optional
        (B,) true text lengths for PADDED streaming batches — masks
        attention at pad positions."""
        if seg_rng is None:
            seg_rng = self.make_rng("dropout")
        return self.decoder.infer_segment(memory, carry, seg_rng, n_steps,
                                          memory_lengths=memory_lengths)

    def decode_init(self, memory, cap: int):
        return self.decoder.infer_init(memory, cap)

    def postnet_residual(self, mel_bmt):
        """Postnet applied to a (B, n_mel, T) window; streaming synthesis
        calls this on overlapping mel windows (the postnet's receptive field
        is n_convs*(kernel-1)/2 frames per side)."""
        post = self.postnet(mel_bmt.transpose(0, 2, 1), False,
                            jax.random.PRNGKey(0))
        return mel_bmt + post.transpose(0, 2, 1)
