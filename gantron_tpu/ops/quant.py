"""Int8 weight streaming for the decoder's in-scan matmuls.

The autoregressive decoder is HBM-bandwidth-bound: each of its sequential
steps streams the four large recurrence matrices (attention-LSTM context/
hidden, decoder-LSTM input/hidden — ~40 MB bf16 at production dims) from HBM
for a small-batch matmul (reference hot loop: model.py:444-449). Storing
those weights as per-output-channel symmetric int8 halves the streamed
bytes, which directly halves the sequential floor of decoding and the
dominant term of the teacher-forced forward.

Two matmul paths:
  * ``qmatmul`` — plain XLA: ``x @ (w_q * scale)``; XLA fuses the dequant
    into the dot operand read, so the weight leaves HBM as int8.
  * ``qmatmul_pallas`` — an explicit Pallas kernel (grid over output tiles,
    int8 tile -> VMEM -> bf16 convert -> MXU) guaranteeing the fusion; used
    when measurement shows XLA materializing the dequantized copy.

Quality: per-channel symmetric int8 on LSTM weights is near-lossless (the
tests bound the decode deviation); it is exposed as an opt-in serving lever
(``HParams.quantized_inference``), never silently.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedMatrix(NamedTuple):
    """Per-output-channel symmetric int8 weight: w ≈ q * scale[None, :]."""

    q: jax.Array      # (I, O) int8
    scale: jax.Array  # (O,) float32


def quantize_per_channel(w) -> QuantizedMatrix:
    """(I, O) float -> QuantizedMatrix with per-column symmetric scales."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedMatrix(q=q, scale=scale)


def dequantize(qm: QuantizedMatrix, dtype=jnp.float32):
    return (qm.q.astype(jnp.float32) * qm.scale[None, :]).astype(dtype)


def qmatmul(x, qm: QuantizedMatrix):
    """x: (..., I) -> (..., O), computed in x.dtype.

    The dequant chain (convert + scale) is elementwise on the dot's rhs;
    XLA's operand fusion keeps the HBM read at int8 width.
    """
    w = qm.q.astype(x.dtype) * qm.scale.astype(x.dtype)[None, :]
    return x @ w


def matmul_rhs(x, w):
    """Dispatch: plain array or QuantizedMatrix right-hand side.

    On TPU the quantized path MUST go through the Pallas kernel: with the
    plain-XLA dequant inside a scan body, XLA's loop-invariant code motion
    hoists ``q * scale`` out of the loop and materializes the full-precision
    weight copy in HBM — the scan then streams the SAME bytes as the
    unquantized model plus the dequant overhead (measured: 0.0172 vs 0.0148
    baseline RTF). The opaque kernel pins the int8 read per step.

    The TPU/other split is made per LOWERING platform
    (``lax.platform_dependent``), not per ``jax.default_backend()`` at trace
    time. This covers CROSS-HOST single-platform export — an artifact
    exported from a CPU host for ``platforms=("tpu",)`` still serves
    int8-streamed on TPU — but NOT multi-platform artifacts: ``jax.export``
    lowers every ``platform_dependent`` branch for every requested platform,
    and the TPU-only Pallas kernel cannot lower for CPU, so
    ``export.export_tts`` rejects quantized multi-platform requests (export
    one artifact per platform instead).
    """
    if isinstance(w, QuantizedMatrix):
        if x.ndim == 2 and _pick_block_o(w.q.shape[1]) is not None:
            return jax.lax.platform_dependent(
                x, w.q, w.scale,
                tpu=lambda x, q, s: qmatmul_pallas(x, QuantizedMatrix(q, s)),
                default=lambda x, q, s: qmatmul(x, QuantizedMatrix(q, s)))
        return qmatmul(x, w)
    return x @ w


def _pick_block_o(O: int, block_o: int = 512):
    """Largest lane-aligned (multiple-of-128) tile that divides O, or None
    when no such tile exists (odd widths fall back to the XLA path rather
    than asserting inside a jitted decode)."""
    for b in range(min(block_o, O), 127, -128):
        if O % b == 0 and b % 128 == 0:
            return b
    return O if O <= block_o and O % 128 == 0 else None


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def qmatmul_pallas(x, qm: QuantizedMatrix, block_o: int = 512,
                   interpret: bool = False):
    """Explicit int8-streamed matmul: grid over output-column tiles; each
    tile's int8 block is DMA'd to VMEM and converted there, so HBM traffic
    is exactly I*O bytes. x: (B, I) with small B (padded to the f32 sublane
    tile); full-I accumulation per tile (I fits VMEM at these dims)."""
    from jax.experimental import pallas as pl

    B, I = x.shape
    O = qm.q.shape[1]
    if O % min(block_o, O) == 0:
        block_o = min(block_o, O)
    else:
        block_o = _pick_block_o(O, block_o)
        assert block_o is not None, \
            f"no lane-aligned tile divides O={O}; use qmatmul (XLA path)"
    pad_b = (-B) % 8
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
    scale2d = qm.scale.reshape(1, O)

    out = pl.pallas_call(
        _qmm_kernel,
        out_shape=jax.ShapeDtypeStruct((B + pad_b, O), x.dtype),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((B + pad_b, I), lambda j: (0, 0)),
            pl.BlockSpec((I, block_o), lambda j: (0, j)),
            pl.BlockSpec((1, block_o), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B + pad_b, block_o), lambda j: (0, j)),
        interpret=interpret,
    )(x, qm.q, scale2d)
    return out[:B] if pad_b else out
