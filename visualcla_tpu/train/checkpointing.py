"""Training checkpoint/resume — full TrainState (params + optimizer + step).

Inference weight formats live in ``checkpoint/`` (safetensors; reference
formats).  Training state is an arbitrary pytree (optax states are nested
namedtuples; LoRA leaves are dicts), so it rides orbax, the TPU-native
checkpointer (async-capable, sharding-aware on restore).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(path: str, state: Any) -> None:
    """Write the TrainState pytree to ``path`` (an orbax directory)."""
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, abstract_state: Any) -> Any:
    """Restore into the structure/shardings of ``abstract_state`` (build it
    with ``jax.eval_shape`` over your init, or pass a live state template)."""
    ckptr = _checkpointer()
    return ckptr.restore(os.path.abspath(path), target=abstract_state)


def latest_step_dir(root: str) -> Optional[str]:
    """Find the newest ``step_N`` checkpoint under ``root`` (or None)."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(root, f"step_{max(steps)}")
