"""Multi-process (multi-host-style) data parallelism, actually exercised.

``test_two_process_data_parallel_step`` spawns TWO separate processes, each
with 4 virtual CPU devices, joined into one 8-device JAX cluster via
``initialize_multihost`` (the replacement for the reference's multiproc.py +
dist.init_process_group, multiproc.py:6-23, train.py:79-91). Both processes
build the same global batch, contribute their local shards with
``jax.make_array_from_process_local_data``, and run one full G step over a
global mesh — the gradient all-reduce crosses the process boundary through
the distributed runtime. Model dims are micro-sized: this host has ONE core,
and two concurrently-compiling processes must still exchange coordination
heartbeats fast enough to keep the cluster alive.

Chief-only checkpoint/log gating (reference rank-0 semantics) is covered
in-process by ``test_non_chief_writes_nothing`` via a process_index
monkeypatch — a second full 2-process training loop is more than a 1-core
host can compile while keeping the cluster's barriers within deadline.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys

port, pid, repo = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
sys.path.insert(0, repo)

import jax

jax.config.update("jax_platforms", "cpu")

from gantron_tpu.parallel.distributed import initialize_multihost, is_chief

rank = initialize_multihost(f"localhost:{port}", 2, pid)
assert rank == pid, (rank, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 4 local x 2 processes
assert is_chief() == (pid == 0)

from gantron_tpu.utils.cache import enable_compilation_cache

# SHARED cache dir (JAX cache writes are atomic): keeps both workers'
# compile times symmetric — see the warning in utils/cache.py.
enable_compilation_cache()

import numpy as np
import jax.numpy as jnp

from gantron_tpu.config import HParams
from gantron_tpu.parallel import make_mesh, shard_batch, shard_state
from gantron_tpu.train.state import create_train_state
from gantron_tpu.train.step import Batch, make_train_steps

# Micro dims: 1-core host, 2 processes compiling concurrently.
hp = HParams()
hp.add_params(dict(
    symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=1, attention_rnn_dim=16, decoder_rnn_dim=16,
    prenet_dim=8, attention_dim=8, attention_location_n_filters=2,
    attention_location_kernel_size=3, postnet_embedding_dim=16,
    postnet_n_convolutions=2, noise_size=4, discriminator_dim=16,
    max_decoder_steps=8, use_noise=True, use_labels=False, scan_unroll=1,
    batch_size=8))

B, T_in, T_out = 8, 8, 8
rng = np.random.RandomState(0)  # same seed everywhere -> same global batch
gate = np.zeros((B, T_out), np.float32); gate[:, -1] = 1
batch = Batch(
    text=jnp.asarray(rng.randint(1, hp.n_symbols, (B, T_in)), jnp.int32),
    text_lengths=jnp.full((B,), T_in, jnp.int32),
    mels=jnp.asarray(rng.randn(B, hp.n_mel_channels, T_out) * 0.1,
                     jnp.float32),
    gate=jnp.asarray(gate),
    speaker=jnp.zeros((B,), jnp.int32),
    emotions=jnp.zeros((B, 5), jnp.float32),
    output_lengths=jnp.full((B,), T_out, jnp.int32))

state, gen, disc, g_tx, d_tx = create_train_state(
    hp, jax.random.PRNGKey(0), tuple(batch))
g_step_fn, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)

mesh = make_mesh()  # global: spans both processes' devices
state = shard_state(jax.device_get(state), mesh)
gbatch = shard_batch(jax.device_get(batch), mesh)

# Precompile WITHOUT executing, then line both processes up at a
# coordination barrier before the first collective runs: the Gloo CPU
# transport only waits ~30 s for a peer at context init, so any compile
# skew (cold vs warm cache, scheduler noise on a 1-core host) past that
# would kill the cluster. The barrier's deadline absorbs the skew; after
# it, both processes execute within milliseconds of each other.
from gantron_tpu.parallel import barrier

g_step = jax.jit(g_step_fn)
g_compiled = g_step.lower(state, gbatch, jnp.float32(1e-3),
                          jnp.float32(10.0)).compile()
barrier("g_step_compiled", timeout_s=600.0)
state, metrics, gen_mel = g_compiled(state, gbatch, jnp.float32(1e-3),
                                     jnp.float32(10.0))
g_loss = float(metrics["generator_loss"])
assert np.isfinite(g_loss)

# Chief-only checkpoint save under process_count==2: exercises the
# process-scoped orbax barrier options (train/checkpoint.py) — an
# un-scoped checkpointer would deadlock here waiting for process 1.
workdir = sys.argv[4]
from gantron_tpu.train.checkpoint import CheckpointManager

ckpt = CheckpointManager(os.path.join(workdir, "ckpts"))
if pid == 0:
    host_state = jax.device_get(state)
    path = ckpt.save(host_state, 1, g_loss)
    restored = ckpt.restore(path, host_state)
    a = jax.tree.leaves(host_state.g_params)[0]
    b = jax.tree.leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

print(f"RESULT {pid} {g_loss:.10f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_INFRA_MARKERS = ("DEADLINE_EXCEEDED", "coordination", "heartbeat",
                  "Barrier timed out")


def _run_cluster(worker, port, tmp_path):
    env = dict(os.environ)
    # The workers set their own platform/device flags; drop the parent's.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid), REPO,
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            # 360 s bounds a cold-cache compile on a loaded 1-core host while
            # keeping worst-case (2 infra retries) inside the suite budget.
            out, _ = p.communicate(timeout=360)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_data_parallel_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)

    # On a 1-core host, heavy CPU contention (e.g. the rest of the suite
    # compiling) can starve the distributed runtime's heartbeats/barriers.
    # Retry ONLY that infrastructure failure mode; numerical or assertion
    # failures inside workers fail immediately.
    for attempt in range(2):
        try:
            procs, outs = _run_cluster(worker, _free_port(), tmp_path)
        except subprocess.TimeoutExpired:
            # A hung worker (starved coordination service) is an infra
            # failure: retry once, then fail.
            if attempt == 1:
                raise
            continue
        if all(p.returncode == 0 for p in procs):
            break
        infra = any(m in out for out in outs for m in _INFRA_MARKERS)
        is_last = attempt == 1
        if not infra or is_last:
            for p, out in zip(procs, outs):
                assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for p, out in zip(procs, outs):
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        _, pid, g_loss = line.split()
        results[int(pid)] = float(g_loss)

    assert set(results) == {0, 1}
    # Replicated outputs must be identical on both processes.
    assert results[0] == results[1], results


def test_non_chief_writes_nothing(tmp_path, monkeypatch):
    """Chief gating (reference rank-0 checks, train.py:426-431): a non-chief
    process runs the identical loop — collective validation included — but
    writes no checkpoints, media, or metric files."""
    import jax

    from gantron_tpu.train import loop as loop_mod

    monkeypatch.setattr(jax, "process_index", lambda: 1)

    from test_train_step import tiny_hp

    hp = tiny_hp(iterations=2, iters_per_checkpoint=2, batch_size=8,
                 text_buckets=[12], mel_buckets=[24],
                 validation_audio=False)
    out_dir = tmp_path / "out"
    state, it = loop_mod.train(str(out_dir), None, False, hp, "synthetic")
    assert it == 2
    written = [f for f in os.listdir(out_dir)
               if f.endswith(".ckpt") or f == "media"
               or f.endswith(".metrics.jsonl")]
    assert written == [], written
    # Training itself still happened (params advanced past init).
    assert int(np.asarray(jax.device_get(state.step))) >= 2
