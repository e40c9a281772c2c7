"""Multi-host initialization helpers.

On a TPU pod slice, call :func:`initialize` once per host before building
meshes; JAX wires the ICI/DCN topology and `jax.devices()` becomes the
global device list.  Single-host (or already-initialized) environments
are no-ops, so the same entry point works everywhere.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True when distributed mode is active.  With no arguments, TPU
    pod environments auto-discover the topology; elsewhere this degrades
    to single-process.
    """
    # Do NOT probe jax.process_count() first: it initializes the local
    # backend, after which distributed.initialize refuses to run.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # already initialized (idempotent re-entry) — fall through to the
        # process_count check
        log.debug("jax.distributed.initialize: %s", e)
    except Exception as e:  # single host / unsupported backend
        log.debug("jax.distributed not initialized (%s); single process", e)
        return False
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch owned by this process (even split)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
