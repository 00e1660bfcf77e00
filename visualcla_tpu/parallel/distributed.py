"""Multi-host initialization + mesh construction for TPU pods/slices.

The reference's only multi-device mechanism is HF ``device_map='auto'`` layer
placement on one host (SURVEY.md §2.c).  The TPU-native equivalent spans hosts:
``jax.distributed`` process group + one global Mesh whose 'model' axis rides
ICI within a slice and 'data' spans slices/DCN.
"""
from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if single-process or already up).
    On TPU pods all arguments auto-detect from the environment."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed up: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except RuntimeError as e:  # already initialized / single process
        logger.info("jax.distributed not (re)initialized: %s", e)


def pod_mesh(n_data: Optional[int] = None):
    """Global (data, model) mesh over all processes' devices.

    Default: 'data' spans slices (DCN-friendly: only gradient/batch collectives
    cross slices), 'model' fills each slice's ICI.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from .sharding import DATA, MODEL

    devices = np.asarray(jax.devices())
    if n_data is None:
        n_data = max(1, jax.process_count())
    n_model = len(devices) // n_data
    return Mesh(devices.reshape(n_data, n_model), (DATA, MODEL))
