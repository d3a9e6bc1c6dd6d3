#!/usr/bin/env python
"""Ablation probe: how much of the G-step backward is in-scan weight-gradient
accumulation?

The decoder scan backward must accumulate dW for every weight used inside the
scan (attention/decoder LSTM matrices, attention energy projections) across
all T_out steps. If XLA implements that as a read-modify-write of the full
f32 gradient buffers per step, the HBM traffic dwarfs the data-gradient path
and a custom VJP that defers dW to post-scan batched matmuls pays.

Measures, at bench shapes (batch 32, T_out 640, bf16 compute):
  fwd            forward pass only
  grad_full      value_and_grad wrt ALL generator params (bench baseline)
  grad_no_scanW  value_and_grad wrt all params EXCEPT the in-scan decoder
                 weights (they become constants; data grads still flow
                 through the scan to the encoder/embedding)

grad_full - grad_no_scanW ~= the cost of in-scan dW accumulation.
"""

import time

import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import make_batch  # noqa: E402

# Weights consumed inside the decoder lax.scan step (everything else —
# prenet, attention-RNN input projection, memory projection, output/gate
# projections — is hoisted out of the scan already).
IN_SCAN = ("attention_rnn", "decoder_rnn", "query_w", "v_w", "loc_conv_w",
           "loc_dense_w")


def split_params(g_params):
    dec = g_params["decoder"]
    scan_w = {k: dec[k] for k in dec if k in IN_SCAN}
    rest_dec = {k: dec[k] for k in dec if k not in IN_SCAN}
    rest = dict(g_params)
    rest["decoder"] = rest_dec
    return scan_w, rest


def merge_params(scan_w, rest):
    dec = dict(rest["decoder"])
    dec.update(scan_w)
    out = dict(rest)
    out["decoder"] = dec
    return out


def time_it(fn, *args, warmup=2, iters=6):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gantron_tpu.config import HParams
    from gantron_tpu.train.state import create_train_state
    from gantron_tpu.losses import tacotron2_loss

    hp = HParams.create("use_labels=False,use_noise=True,fp16_run=True")
    batch = make_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))

    k_drop, k_noise = jax.random.split(jax.random.PRNGKey(1))

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
            tree)

    def loss_fn(g_params):
        out, _ = gen.apply(
            {"params": cast(g_params), "batch_stats": state.g_batch_stats},
            batch.text, batch.text_lengths, batch.mels.astype(jnp.bfloat16),
            batch.speaker, batch.emotions, batch.output_lengths, train=True,
            rngs={"dropout": k_drop, "noise": k_noise},
            mutable=["batch_stats"])
        out = [o.astype(jnp.float32) for o in out]
        mel_l, gate_l, attn_l = tacotron2_loss(
            out, (batch.mels, batch.gate), batch.text_lengths,
            batch.output_lengths)
        return mel_l + gate_l + 10.0 * attn_l

    fwd = jax.jit(loss_fn)
    grad_full = jax.jit(jax.value_and_grad(loss_fn))

    scan_w, rest = split_params(state.g_params)

    @jax.jit
    def grad_no_scanw(rest, scan_w):
        return jax.value_and_grad(
            lambda r: loss_fn(merge_params(scan_w, r)))(rest)

    t_fwd = time_it(fwd, state.g_params)
    t_full = time_it(grad_full, state.g_params)
    t_now = time_it(grad_no_scanw, rest, scan_w)

    print(f"fwd            {t_fwd*1e3:8.1f} ms")
    print(f"grad_full      {t_full*1e3:8.1f} ms")
    print(f"grad_no_scanW  {t_now*1e3:8.1f} ms")
    print(f"in-scan dW accumulation cost ~= {(t_full-t_now)*1e3:8.1f} ms "
          f"({100*(t_full-t_now)/t_full:.0f}% of full grad)")


if __name__ == "__main__":
    main()
