#!/usr/bin/env python
"""Benchmark: full-size GANtron training steps/sec on one chip.

Runs the vanilla GANtron config (use_labels=False, use_noise=True — BASELINE
config 1) at the reference's production shape (batch 32, full 28M-param
model) on synthetic LJSpeech-like data, timing the production G/G/D schedule
cycle (g_freq=2, d_freq=1, reference hparams.py:95-96). Mixed precision
(fp16_run -> bf16 compute, f32 master params) matches the V100 fp16 baseline
conditions; the f32 path measures ~8.7 steps/s on the same shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N,
   "median": N, "min": N, "max": N, "spread_pct": N,
   "flops_per_step": N, "mfu": N}

``value`` is the MEDIAN of TRIALS independent timed blocks (single-shot
captures measured +-9% run-to-run through the axon tunnel — VERDICT r4);
``spread_pct`` bounds every throughput claim derived from this file.
``mfu`` = median steps/s x XLA-counted FLOPs/step / peak bf16 FLOP/s for
the detected chip (197 TFLOP/s for TPU v5e).

``vs_baseline`` compares against V100_BASELINE_STEPS_PER_SEC — NVIDIA's
tacotron2 reference trains at ~0.55 s/step (~1.8 steps/s) at batch 32 fp16 on
a V100; the reference repo publishes no numbers (BASELINE.md), so that known
Tacotron2 figure stands in as the 1x baseline. The north-star target is
vs_baseline >= 3.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_BASELINE_STEPS_PER_SEC = 1.8

# Backend init through the axon tunnel either raises RuntimeError
# (Unavailable) quickly or hangs; both must become a parsable skip line so
# the driver record distinguishes "chip down" from "code broke"
# (BENCH_r03 captured a 30-line traceback for a chip outage).
BACKEND_INIT_TIMEOUT_S = 240


def _probe_backend(metric):
    """Initialize the JAX backend in a SUBPROCESS, converting outages into a
    skip marker. A subprocess (not signal.alarm) because a hanging tunnel
    blocks inside a C call where Python signal handlers never run — measured:
    jax.devices() hung >9 min without raising during the round-3/4 outage.

    Returns None on success. On failure prints ONE parsable JSON line with
    ``"skipped": "tpu-unavailable"`` and returns an exit code (0: an outage
    is not a code regression).
    """
    import subprocess

    err = None
    try:
        # Import gantron_tpu FIRST so the child resolves the backend exactly
        # like the parent benchmark will (the package applies a
        # GANTRON_PLATFORM pin at import). Probing bare jax would test the
        # tunnel while the benchmark runs pinned-CPU, or vice versa.
        r = subprocess.run(
            [sys.executable, "-c", "import gantron_tpu, jax; jax.devices()"],
            timeout=BACKEND_INIT_TIMEOUT_S, capture_output=True, text=True)
        if r.returncode != 0:
            tail = [ln for ln in r.stderr.strip().splitlines() if ln.strip()]
            err = tail[-1][:200] if tail else f"probe exit {r.returncode}"
    except subprocess.TimeoutExpired:
        err = f"backend init exceeded {BACKEND_INIT_TIMEOUT_S}s (hang)"
    if err is None:
        return None
    print(json.dumps({
        "metric": metric,
        "value": None,
        "unit": "steps/sec",
        "vs_baseline": None,
        "skipped": "tpu-unavailable",
        "error": err,
    }))
    return 0


def _metric_name(frames_per_step: int) -> str:
    ktag = f", K={frames_per_step}" if frames_per_step != 1 else ""
    return ("LJSpeech-shape GAN train steps/sec/chip "
            f"(batch {BATCH}, T_out {T_OUT}, G/G/D cycle{ktag})")

# Production-shaped synthetic batch: LJSpeech mel lengths average ~560 frames
# at 22.05 kHz / hop 256; text ~110 symbols.
BATCH = 32
T_IN = 128
T_OUT = 640
WARMUP_CYCLES = 4   # first post-compile cycles run slow (device ramp +
                    # tunnel settling); measured spread without the longer
                    # warmup was 15.7-17.2 steps/s on identical code
TIMED_CYCLES = 12  # each cycle = 2 G steps + 1 D step
TRIALS = 5  # independent timed blocks; a single 12-cycle capture measured
            # +-9% run-to-run across rounds (VERDICT r4: driver 15.99 vs
            # 17.34 re-run on identical code) — report median + spread so
            # round-over-round deltas are resolvable against the noise

# Peak dense bf16 FLOP/s per chip, keyed by jax device_kind, for the MFU
# figure. TPU v5e ("TPU v5 lite"): 197 TFLOP/s bf16 (public spec).
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
}


def _step_flops(compiled):
    """XLA-counted FLOPs of one compiled step (cost analysis), or None.

    This is the compiler's own count of executed FLOPs for the optimized
    HLO — the honest numerator for MFU (it includes whatever XLA chose to
    rematerialize; it does not include convolution lowering tricks we
    can't see). Some backends/tunnels return no cost model; degrade to
    None rather than guessing.
    """
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def make_batch(hp, seed=0, B=None):
    from gantron_tpu.train.step import Batch

    B = B or BATCH
    rng = np.random.RandomState(seed)
    text = rng.randint(1, hp.n_symbols, (B, T_IN)).astype(np.int32)
    text_lengths = rng.randint(T_IN // 2, T_IN + 1, B).astype(np.int32)
    text_lengths[0] = T_IN
    mels = (rng.randn(B, hp.n_mel_channels, T_OUT) * 1.5 - 6).astype(
        np.float32)
    output_lengths = rng.randint(T_OUT // 2, T_OUT + 1, B).astype(np.int32)
    output_lengths[0] = T_OUT
    gate = np.zeros((B, T_OUT), np.float32)
    for b in range(B):
        mels[b, :, output_lengths[b]:] = 0
        gate[b, output_lengths[b] - 1:] = 1
    return Batch(
        text=jnp.asarray(text), text_lengths=jnp.asarray(text_lengths),
        mels=jnp.asarray(mels), gate=jnp.asarray(gate),
        speaker=jnp.zeros((B,), jnp.int32),
        emotions=jnp.zeros((B, 5), jnp.float32),
        output_lengths=jnp.asarray(output_lengths))


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--frames_per_step", type=int, default=1,
                        help="decoder K (n_frames_per_step); the driver runs "
                             "the default K=1, --frames_per_step 2/4 gives "
                             "the throughput/MFU frontier")
    args = parser.parse_args()

    metric = _metric_name(args.frames_per_step)
    rc = _probe_backend(metric)
    if rc is not None:
        sys.exit(rc)

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gantron_tpu.config import HParams
    from gantron_tpu.train.state import create_train_state
    from gantron_tpu.train.step import make_train_steps

    hp = HParams.create("use_labels=False,use_noise=True,fp16_run=True,"
                        f"n_frames_per_step={args.frames_per_step}")
    if not hp.use_noise:
        hp.noise_size = 0

    batch = make_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step_fn, d_step_fn, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    # NOTE: no donation here — donated buffers defeat block_until_ready
    # through the axon tunnel, producing bogus timings.
    g_step = jax.jit(g_step_fn)
    d_step = jax.jit(d_step_fn)

    g_lr = jnp.float32(hp.g_learning_rate)
    d_lr = jnp.float32(hp.d_learning_rate)
    attn_w = jnp.float32(10.0)

    def run_cycle(state):
        state, _, _ = g_step(state, batch, g_lr, attn_w)
        state, g_metrics, (gen_mel, gen_lengths) = g_step(state, batch,
                                                          g_lr, attn_w)
        state, d_metrics = d_step(state, batch.mels, batch.output_lengths,
                                  gen_mel, gen_lengths, d_lr)
        # gen refs returned so the MFU cost analysis below can .lower()
        # the d_step with the EXACT timed signature (a dtype-mismatched
        # stand-in would trigger a second full compile).
        return state, g_metrics, d_metrics, (gen_mel, gen_lengths)

    for _ in range(WARMUP_CYCLES):
        state, gm, dm, gen_ref = run_cycle(state)
    # Fetching the losses forces full materialization of the step.
    float(gm["generator_loss"]), float(dm["discriminator_loss"])
    jax.block_until_ready(state)

    trial_sps = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(TIMED_CYCLES):
            state, gm, dm, gen_ref = run_cycle(state)
        float(gm["generator_loss"]), float(dm["discriminator_loss"])
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        trial_sps.append(TIMED_CYCLES * 3 / dt)

    trial_sps.sort()
    median = trial_sps[len(trial_sps) // 2]
    spread_pct = (trial_sps[-1] - trial_sps[0]) / median * 100

    # MFU: XLA-counted FLOPs for the G/G/D cycle / wall-clock / peak
    # bf16. Reuse the TIMED wrappers — .lower().compile() on the same
    # jit object and signature resolves to the already-built executable
    # instead of compiling the 28M-param steps a second time.
    g_flops = _step_flops(g_step.lower(
        state, batch, g_lr, attn_w).compile())
    d_flops = _step_flops(d_step.lower(
        state, batch.mels, batch.output_lengths,
        gen_ref[0], gen_ref[1], d_lr).compile())
    device_kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_FLOPS.get(device_kind)
    mfu = flops_per_step = None
    if g_flops and d_flops:
        cycle_flops = 2 * g_flops + d_flops
        flops_per_step = cycle_flops / 3
        if peak:
            # median steps/s * FLOPs/step = achieved FLOP/s
            mfu = median * flops_per_step / peak

    print(json.dumps({
        "metric": metric,
        "value": round(median, 4),
        "unit": "steps/sec",
        "vs_baseline": round(median / V100_BASELINE_STEPS_PER_SEC, 4),
        "median": round(median, 4),
        "min": round(trial_sps[0], 4),
        "max": round(trial_sps[-1], 4),
        "spread_pct": round(spread_pct, 2),
        "trials": TRIALS,
        "cycles_per_trial": TIMED_CYCLES,
        "flops_per_step": round(flops_per_step) if flops_per_step else None,
        "mfu": round(mfu, 5) if mfu is not None else None,
        "peak_bf16_flops": peak,
        # Honesty field: a GANTRON_PLATFORM=cpu pin (or a mis-resolved
        # backend) must be visible in the record, not pass as a chip number.
        "device": device_kind,
    }))


if __name__ == "__main__":
    main()
