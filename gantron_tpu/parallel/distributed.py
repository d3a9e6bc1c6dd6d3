"""Multi-host entry (replaces reference multiproc.py + distributed.py).

The reference spawns one process per GPU and wires NCCL through TCP
(multiproc.py:6-23, distributed.py:126-173). On TPU pods, JAX is
single-controller per host: run the SAME ``train.py`` command on every host
after calling ``initialize_multihost()``; the mesh in
``gantron_tpu.parallel.mesh`` then spans all chips of all hosts and XLA
routes gradient reductions over ICI (intra-slice) / DCN (inter-slice).

No gradient hooks, no bucketing, no launcher: the all-reduce is implicit in
the jitted train step once the batch is sharded over the ``data`` axis.
"""

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Initialize JAX distributed. On TPU pods with default env vars this is
    zero-config; the explicit args cover manual setups (mirrors the
    reference's dist_url/world_size/rank trio, hparams.py:21-22).

    Returns the process index (0 = chief, like the reference's rank 0).
    """
    # NOTE: nothing may touch the XLA backend (jax.devices/process_count/...)
    # before jax.distributed.initialize, or the cluster can never form —
    # exercised by tests/test_multihost.py with a real 2-process cluster.
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except ValueError:
        if explicit:
            raise  # real mis-setup (bad address / inconsistent args)
        # auto mode, no cluster detected ("coordinator_address must be
        # set"): a plain single-process run — fine.
    except RuntimeError:
        # A RuntimeError means a cluster WAS configured but failed to form
        # (coordinator unreachable, backend already initialized, ...).
        # Swallowing it would silently degrade a pod into N independent
        # trainings that all believe they are chief.
        raise
    return jax.process_index()


def is_chief() -> bool:
    """True on the process that should log/checkpoint (reference rank==0)."""
    return jax.process_index() == 0


def barrier(name: str, timeout_s: float = 600.0) -> None:
    """Block until every process reaches this barrier.

    Coordination-service based (NOT a device collective), so it works before
    any compiled program runs. Use it to line processes up right before the
    first collective-bearing execution: XLA's CPU Gloo transport gives a
    peer only ~30 s to show up at context init — far less than a cold jit
    compile — while this barrier's deadline is generous and configurable.
    The pattern (exercised by tests/test_multihost.py) is::

        compiled = jax.jit(step).lower(*args).compile()   # no comms yet
        barrier("step_compiled")                          # absorb skew
        out = compiled(*args)                             # peers in lockstep

    Single-process runs and uninitialized clusters are no-ops.
    """
    if jax.process_count() < 2:
        return
    try:
        # Private JAX internals: the coordination-service client exposes the
        # only barrier with a CONFIGURABLE deadline (the public
        # sync_global_devices below runs a collective whose Gloo context
        # init gives peers only ~30 s — less than a cold jit compile).
        from jax._src import distributed as _internal

        client = getattr(getattr(_internal, "global_state", None),
                         "client", None)
        if client is not None:
            client.wait_at_barrier(f"gantron_barrier:{name}",
                                   int(timeout_s * 1000))
            return
    except (ImportError, AttributeError):
        # AttributeError: the module still imports but global_state/
        # wait_at_barrier was renamed — the same "internals moved" case.
        pass
    # A JAX upgrade moved/removed the internal client: fall back to the
    # public device sync (shorter implicit deadline, but a working barrier
    # beats a silent no-op on multihost startup).
    import warnings

    warnings.warn(
        "jax._src.distributed client unavailable; falling back to "
        "multihost_utils.sync_global_devices for barrier "
        f"'{name}' (fixed, shorter transport deadline)")
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"gantron_barrier:{name}")
