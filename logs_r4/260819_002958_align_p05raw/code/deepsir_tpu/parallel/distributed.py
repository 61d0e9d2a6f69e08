"""Multi-host runtime entry point.

All-new design (the reference is single-process, single-GPU —
/root/reference/train.py:28-32; no distributed backend anywhere, SURVEY.md
§2.5/§5.8). One JAX process runs per host; `jax.distributed.initialize`
connects them through the coordination service, after which `jax.devices()`
is GLOBAL (every chip of every host) and `parallel.mesh.make_mesh` lays the
(data, model) mesh over the full slice — ICI collectives within a slice, DCN
across slices, all inserted by XLA from the sharding annotations.

Wiring is env-driven so the same training command works single-host (no env,
no-op) and multi-host (one env block per process):

    DEEPSIR_COORDINATOR=host0:8476 \
    DEEPSIR_NUM_PROCESSES=2 DEEPSIR_PROCESS_ID=0 python train.py ...

On Cloud TPU pods the three variables may be omitted but
DEEPSIR_DISTRIBUTED=1 set: `jax.distributed.initialize()` then autodetects
the pod topology from the TPU metadata.
"""
from __future__ import annotations

import logging
import os

import jax

_logger = logging.getLogger(__name__)
_initialized = False


def initialize_from_env() -> bool:
    """Initialize the multi-process runtime if the env requests it.

    Returns True when running multi-process (after initialize), False for
    plain single-process runs. Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("DEEPSIR_COORDINATOR")
    if coord is not None:
        num = int(os.environ["DEEPSIR_NUM_PROCESSES"])
        pid = int(os.environ["DEEPSIR_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num, process_id=pid)
    elif os.environ.get("DEEPSIR_DISTRIBUTED"):
        jax.distributed.initialize()        # TPU-pod autodetection
    else:
        return False
    _initialized = True
    _logger.info("distributed runtime up: process %d/%d, %d local / %d "
                 "global devices", jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return True
