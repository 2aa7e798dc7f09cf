"""JAX runtime setup helpers."""

from __future__ import annotations

import os
import threading

_warmup_started = False

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host bootstrap: `jax.distributed.initialize` wiring
    (SURVEY.md §2.3 item 7 / §5 "distributed communication backend").

    Controlled by env (or explicit args): MSC_COORDINATOR=host:port,
    MSC_NUM_PROCESSES, MSC_PROCESS_ID.  Returns True when a multi-process
    runtime was initialized.  MUST run before any JAX backend touch —
    `enable_compilation_cache` calls it first for exactly that reason.

    Axis placement contract (see parallel/mesh.py:make_multihost_mesh):
    the DATA axis spans processes (DCN — scene-level batch parallelism
    tolerates slow links); TP/SP/PP axes stay within a process's local
    devices (ICI — per-step collectives need ICI bandwidth).

    No reference counterpart (the reference is a single Python process
    speaking HTTPS, `src/agents/base_agent.py:14-58`); mandated by the
    rebuild blueprint.
    """
    coordinator = coordinator or os.environ.get("MSC_COORDINATOR")
    if not coordinator:
        return False
    import jax

    num = int(num_processes if num_processes is not None
              else os.environ.get("MSC_NUM_PROCESSES", "1"))
    pid = int(process_id if process_id is not None
              else os.environ.get("MSC_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num, process_id=pid)
    return True


def enable_compilation_cache(path: str | None = None):
    """Turn on JAX's persistent compilation cache (first compile of the
    kernel suite costs tens of seconds; the cache makes every later
    process start warm)."""
    import jax

    # Reliable platform override: the image pre-wires JAX_PLATFORMS=axon
    # and the plugin can override a plain env change, so MSC_PLATFORM goes
    # through jax.config (must run before backend initialization).
    want = os.environ.get("MSC_PLATFORM")
    if want:
        jax.config.update("jax_platforms", want)
    # multi-host bootstrap must precede backend initialization
    init_distributed()

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       _DEFAULT_CACHE)
    # separate cache namespaces per backend: CPU AOT artifacts compiled
    # under one machine-feature set can SIGILL when loaded by another
    cache_dir = os.path.join(cache_dir, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    warmup_device_transfer()


def warmup_device_transfer():
    """Absorb the tunnel's first device->host transfer stall off-thread.

    Measured on the axon TPU tunnel: the FIRST d2h transfer of a process
    stalls for 1-5 minutes regardless of payload size; every subsequent
    transfer runs at full speed.  Issuing a 4-byte warmup transfer from a
    daemon thread at startup overlaps the stall with compilation and data
    loading, so the pipeline's real transfers are never the first one.
    """
    global _warmup_started
    if _warmup_started:
        return
    _warmup_started = True

    def _warm():
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            if jax.default_backend() == "cpu":
                return
            np.asarray(jnp.zeros((1,), jnp.float32))
        except Exception:
            pass

    t = threading.Thread(target=_warm, daemon=True, name="msc-d2h-warmup")
    t.start()

    # joining at exit prevents the tunnel client's C++ teardown from
    # killing the process ("terminate called after throwing ...") when a
    # short-lived tool exits while the warmup transfer is still blocked;
    # long-lived processes (bench, runner, training) finish the warmup
    # within seconds so the join is a no-op there
    import atexit

    atexit.register(lambda: t.join(timeout=330) if t.is_alive() else None)
