"""Serving export: serialize the inference graph to a standalone artifact.

TPU-native deployment path with no reference counterpart — the reference
"deploys" by unpickling a full torch module and calling it under the GIL
(reference utils.py:217-223, inference_samples.py:28-39). Here the whole
text→mel (optionally text→wav) computation — decoder scan, postnet, and,
if requested, the WaveGlow inverse flow, with all weights baked in as
constants — is exported through ``jax.export`` into one StableHLO blob.
A server deserializes the blob and calls it; no model code, checkpoint
loading, or Python class definitions are needed at serving time, and the
artifact is portable across the platforms it was lowered for
(default: TPU + CPU).

Shapes are static by default (XLA serving: pad text to the export length;
the returned per-sample lengths tell the caller where each decode stopped).
Passing ``batch_size=None`` and/or ``text_len=None`` exports a
shape-polymorphic artifact instead — one file serves any batch size / text
length (the encoder scan drops to unroll=1 over a symbolic length; the
decoder scan is over the static ``max_decoder_steps`` either way).
"""

import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def make_infer_fn(model, variables, max_steps: Optional[int] = None,
                  waveglow=None, sigma: float = 0.666):
    """Build ``fn(text_ids, text_lengths, key[, emotions, speaker]) ->
    (out, lengths)`` where ``out`` is the postnet mel (B, n_mel, S) — or the
    waveform (B, S*hop*...) when ``waveglow`` is given.

    ``text_lengths`` (B,) are the TRUE per-sample lengths: exported serving
    pads every text to the artifact's static length (``pad_text``), and the
    mask keeps encoder state and attention off the pad positions — without
    it a ragged batch silently attends to pad embeddings."""
    hp = model.hp
    conditioned = bool(hp.vesus_path)

    def fn(text_ids, text_lengths, key, emotions=None, speaker=None):
        out = model.apply(
            variables, text_ids, None, emotions, speaker, max_steps, False,
            method=model.infer, text_lengths=text_lengths,
            rngs={"dropout": jax.random.fold_in(key, 0),
                  "noise": jax.random.fold_in(key, 1)})
        mel_post, lengths = out[1], out[4]
        if waveglow is None:
            return mel_post, lengths
        wav = waveglow.infer(mel_post, sigma, jax.random.fold_in(key, 2))
        return wav, lengths

    return fn, conditioned


def export_tts(model, variables, path: str, batch_size: Optional[int] = 1,
               text_len: Optional[int] = 96, max_steps: Optional[int] = None,
               waveglow=None, sigma: float = 0.666,
               platforms: Optional[Sequence[str]] = None) -> int:
    """Serialize the inference graph to ``path``. Returns artifact bytes.

    ``batch_size`` / ``text_len``: concrete export shape, or ``None`` for a
    symbolic (shape-polymorphic) dimension — the artifact then accepts any
    value at call time, at the cost of less shape-specialized XLA code.

    ``platforms``: lowering targets (default ``("tpu", "cpu")`` so one
    artifact serves on TPU and still runs in CPU tests/CI). Exception:
    with ``hp.quantized_inference`` the default is ``("tpu",)`` — the int8
    Pallas kernel resolves per lowering platform (ops/quant.py
    ``matmul_rhs``), which covers cross-host single-platform export, but a
    MULTI-platform module still lowers every ``lax.platform_dependent``
    branch for every platform and the TPU-only kernel cannot lower for
    CPU; export one artifact per platform instead.
    """
    fn, conditioned = make_infer_fn(model, variables, max_steps, waveglow,
                                    sigma)
    hp = model.hp
    quantized = getattr(hp, "quantized_inference", False)
    if platforms is None:
        platforms = ("tpu",) if quantized else ("tpu", "cpu")
    elif quantized and len(tuple(platforms)) > 1:
        raise ValueError(
            "quantized_inference exports are single-platform (the int8 "
            "Pallas kernel only lowers for TPU); export one artifact per "
            f"platform instead of platforms={tuple(platforms)}")
    sym_names = [n for n, v in (("b", batch_size), ("t", text_len))
                 if v is None]
    if sym_names:
        syms = dict(zip(sym_names,
                        jax.export.symbolic_shape(", ".join(sym_names))))
        batch_size = syms.get("b", batch_size)
        text_len = syms.get("t", text_len)
    args = [jax.ShapeDtypeStruct((batch_size, text_len), jnp.int32),
            jax.ShapeDtypeStruct((batch_size,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32)]
    if conditioned:
        args += [jax.ShapeDtypeStruct((batch_size, 5), jnp.float32),
                 jax.ShapeDtypeStruct((batch_size,), jnp.int32)]
        wrapped = fn
    else:
        def wrapped(text_ids, text_lengths, key):
            return fn(text_ids, text_lengths, key)

    exported = jax.export.export(jax.jit(wrapped),
                                 platforms=tuple(platforms))(*args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str):
    """Deserialize an exported artifact; returns a callable
    ``fn(text_ids, text_lengths, key[, emotions, speaker]) ->
    (out, lengths)``. Needs no model code or checkpoint — the weights live
    inside the artifact."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    return exported.call


def pad_text(ids: np.ndarray, text_len: int) -> np.ndarray:
    """Zero-pad (or reject over-length) token ids to the exported length."""
    ids = np.atleast_2d(np.asarray(ids, np.int32))
    if ids.shape[1] > text_len:
        raise ValueError(f"text length {ids.shape[1]} exceeds the exported "
                         f"static length {text_len}")
    out = np.zeros((ids.shape[0], text_len), np.int32)
    out[:, :ids.shape[1]] = ids
    return out
