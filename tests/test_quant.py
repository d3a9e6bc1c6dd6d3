"""Int8 weight streaming (ops/quant.py + the decoder's
``quantized_inference`` serving lever)."""

import numpy as np

import jax
import jax.numpy as jnp

from gantron_tpu.ops.quant import (QuantizedMatrix, dequantize, matmul_rhs,
                                   qmatmul, qmatmul_pallas,
                                   quantize_per_channel)
from test_model import init_and_apply, make_batch, tiny_hp


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(96, 160).astype(np.float32) * 0.07)
    qm = quantize_per_channel(w)
    assert qm.q.dtype == jnp.int8 and qm.scale.shape == (160,)
    # Rounding error is at most half a quantization step per element.
    err = jnp.abs(dequantize(qm) - w)
    assert float(jnp.max(err - qm.scale[None, :] / 2)) <= 1e-6


def test_qmatmul_matches_dequantized_matmul():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    qm = quantize_per_channel(w)
    ref = x @ dequantize(qm)
    np.testing.assert_allclose(np.asarray(qmatmul(x, qm)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # matmul_rhs dispatches on type.
    np.testing.assert_allclose(np.asarray(matmul_rhs(x, qm)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(matmul_rhs(x, w)),
                               np.asarray(x @ w), rtol=1e-6, atol=1e-6)


def test_qmatmul_pallas_matches_xla():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(64, 256).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(3, 64).astype(np.float32))  # B=3 -> row pad
    qm = quantize_per_channel(w)
    out = qmatmul_pallas(x, qm, block_o=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(qmatmul(x, qm)),
                               rtol=1e-5, atol=1e-5)


def test_quantized_inference_decode_deviation():
    """int8-weight decoding must stay close to the f32 decode: same gate
    stops, bounded mel deviation (the serving-quality contract)."""
    hp = tiny_hp()
    batch = make_batch(hp)
    model, variables, _ = init_and_apply(hp, batch, train=False)
    text = batch[0]
    rngs = {"dropout": jax.random.PRNGKey(5), "noise": jax.random.PRNGKey(6)}

    out_f32 = model.apply(variables, text, method=model.infer, rngs=rngs)
    hp.quantized_inference = True
    out_q = model.apply(variables, text, method=model.infer, rngs=rngs)

    mel_f, mel_q = np.asarray(out_f32[1]), np.asarray(out_q[1])
    len_f, len_q = np.asarray(out_f32[4]), np.asarray(out_q[4])
    # Same decode lengths (gate decisions unchanged by quantization noise).
    np.testing.assert_array_equal(len_f, len_q)
    T = int(len_f.min())
    mae = float(np.mean(np.abs(mel_f[..., :T] - mel_q[..., :T])))
    scale = float(np.mean(np.abs(mel_f[..., :T])))
    assert mae <= 0.05 * max(scale, 1.0), (mae, scale)

    # Early-exit path honors the flag identically.
    out_ee = model.apply(variables, text, method=model.infer, rngs=rngs,
                         early_exit=True)
    np.testing.assert_allclose(np.asarray(out_ee[1])[..., :T],
                               mel_q[..., :T], rtol=2e-3, atol=2e-3)


def test_matmul_rhs_platform_dispatch_under_jit():
    """matmul_rhs splits Pallas-vs-XLA per LOWERING platform
    (lax.platform_dependent), so it must jit, run, and match the plain
    dequant matmul on this CPU host — and remain exportable for platforms
    without a live backend (covered in test_export.py)."""
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(64, 256).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    qm = quantize_per_channel(w)
    out = jax.jit(matmul_rhs)(x, qm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(qmatmul(x, qm)),
                               rtol=1e-5, atol=1e-5)
    # Plain-array rhs passes through untouched.
    np.testing.assert_allclose(np.asarray(jax.jit(matmul_rhs)(x, w)),
                               np.asarray(x @ w), rtol=1e-5, atol=1e-5)
