"""Multi-host (multi-slice) initialisation.

The reference never goes multi-process (DDP imported-unused,
``regenerateFromtrain2.py:23``; SURVEY.md §2.3). Here multi-host SPMD
is one call: ``jax.distributed.initialize`` wires the DCN coordination
plane; everything else (mesh, shardings, collectives) is identical to
single-host because GSPMD programs are global. Data loading is per-host
(``data.loader.host_shard``).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

log = logging.getLogger("worddiffusion")


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialise the distributed runtime when running multi-process.

    No-ops on single-process (returns (0, 1)). With TPU pods, the
    arguments are auto-detected from the TPU environment when None.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process / unsupported backend
            log.debug("jax.distributed.initialize skipped: %s", e)
            return 0, 1
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> int:
    """Per-host batch size for an evenly host-sharded global batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
