#!/usr/bin/env python
"""Measure the full jitted G-step with deferred-dW on vs off (bench shapes)."""

import time

import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import make_batch  # noqa: E402


def time_g_step(hp_string):
    from gantron_tpu.config import HParams
    from gantron_tpu.train.state import create_train_state
    from gantron_tpu.train.step import make_train_steps

    hp = HParams.create(hp_string)
    batch = make_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step_fn, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    g_step = jax.jit(g_step_fn)
    lr, aw = jnp.float32(1e-3), jnp.float32(10.0)

    for _ in range(3):
        state, m, _ = g_step(state, batch, lr, aw)
    float(m["generator_loss"])
    jax.block_until_ready(state.g_params)
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        state, m, _ = g_step(state, batch, lr, aw)
    float(m["generator_loss"])
    jax.block_until_ready(state.g_params)
    return (time.perf_counter() - t0) / N, float(m["generator_loss"])


def main():
    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    base = "use_labels=False,use_noise=True,fp16_run=True"
    t_def, l_def = time_g_step(base + ",deferred_dw=True")
    t_plain, l_plain = time_g_step(base + ",deferred_dw=False")
    print(f"g_step deferred_dw=True   {t_def*1e3:7.1f} ms  loss {l_def:.4f}")
    print(f"g_step deferred_dw=False  {t_plain*1e3:7.1f} ms  loss {l_plain:.4f}")
    print(f"speedup {t_plain/t_def:.3f}x")


if __name__ == "__main__":
    main()
