#!/usr/bin/env python
"""scan_unroll sweep on the full-size bf16 G step (batch 32, T_out 640).

Round-1 measured 260/197/166 ms at unroll 1/4/8 and defaulted to 8; this
sweeps further (8/12/16) to check whether more unrolling still pays at the
current step (deferred-dW + fused location kernel) or compile time /
I-cache pressure has flattened the curve.
"""

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

    for unroll in (8, 12, 16):
        hp = HParams.create(
            "use_labels=False,use_noise=True,fp16_run=True,"
            f"scan_unroll={unroll}")
        batch = make_batch(hp)
        state, gen, disc, g_tx, d_tx = create_train_state(
            hp, jax.random.PRNGKey(0), tuple(batch))
        g_step = jax.jit(make_train_steps(hp, gen, disc, g_tx, d_tx)[0])
        lr, aw = jnp.float32(1e-3), jnp.float32(10.0)
        t_c0 = time.perf_counter()
        for _ in range(4):
            state, m, _ = g_step(state, batch, lr, aw)
        float(m["generator_loss"])
        jax.block_until_ready(state.g_params)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        N = 10
        for _ in range(N):
            state, m, _ = g_step(state, batch, lr, aw)
        float(m["generator_loss"])
        jax.block_until_ready(state.g_params)
        dt = (time.perf_counter() - t0) / N
        print(f"unroll={unroll:<3d} g_step {dt*1e3:7.1f} ms  "
              f"(compile+warm {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
