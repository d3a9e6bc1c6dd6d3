#!/usr/bin/env python
"""Batch-scaling of the G step under deferred-dW (bf16, T_out 640)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import make_batch  # noqa: E402


def main():
    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gantron_tpu.config import HParams
    from gantron_tpu.train.state import create_train_state
    from gantron_tpu.train.step import make_train_steps

    for B in (32, 64, 128):
        hp = HParams.create(
            "use_labels=False,use_noise=True,fp16_run=True,deferred_dw=True")
        batch = make_batch(hp, B=B)
        state, gen, disc, g_tx, d_tx = create_train_state(
            hp, jax.random.PRNGKey(0), tuple(batch))
        g_step = jax.jit(make_train_steps(hp, gen, disc, g_tx, d_tx)[0])
        lr, aw = jnp.float32(1e-3), jnp.float32(10.0)
        for _ in range(3):
            state, m, _ = g_step(state, batch, lr, aw)
        float(m["generator_loss"])
        jax.block_until_ready(state.g_params)
        t0 = time.perf_counter()
        N = 8
        for _ in range(N):
            state, m, _ = g_step(state, batch, lr, aw)
        float(m["generator_loss"])
        jax.block_until_ready(state.g_params)
        dt = (time.perf_counter() - t0) / N
        print(f"B={B:<4d} g_step {dt*1e3:7.1f} ms  {B/dt:7.1f} samples/s",
              flush=True)


if __name__ == "__main__":
    main()
