"""Checkpoint save/restore with full train-state resume.

The reference has no working resume: per-epoch torch.save is commented out
(tools/train_STTran.py:206-208) and test scripts load bare state_dicts with
strict=False (tools/test_STTran.py:51-52). Here the entire TrainState —
params, batch_stats, optimizer state, step, skip counter — plus the config
snapshot round-trips through Orbax, so training resumes bit-exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, state, config_json: str | None = None,
                    keep: int = 3, extra: dict | None = None) -> str:
    """Write TrainState under directory/<step>; returns the path.

    `extra` (JSON-serializable, primary process only) persists host-side
    training state the TrainState pytree cannot hold — e.g. the plateau
    scheduler's lr/best/num_bad, without which a resume resets the decayed
    learning rate back to cfg.lr at its first epoch end."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(lambda x: x, state), force=True)
    ckptr.wait_until_finished()
    if config_json is not None:
        with open(os.path.join(directory, "configs.json"), "w") as f:
            f.write(config_json)  # config snapshot (train_STTran.py:28-29)
    if extra is not None:
        with open(os.path.join(directory, f"{step}.meta.json"), "w") as f:
            json.dump(extra, f)
    steps = sorted((int(d) for d in os.listdir(directory) if d.isdigit()))
    for old in steps[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(directory, str(old)), ignore_errors=True)
        meta = os.path.join(directory, f"{old}.meta.json")
        if os.path.isfile(meta):
            os.remove(meta)
    return path


def load_meta(directory: str, step: int | None = None) -> dict | None:
    """The `extra` dict saved alongside checkpoint `step` (latest when None);
    None when absent (checkpoints written before the sidecar existed)."""
    step = step if step is not None else latest_step(directory)
    if step is None:
        return None
    p = os.path.join(os.path.abspath(directory), f"{step}.meta.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return json.load(f)


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, abstract_state: Any, step: int | None = None):
    """Restore a TrainState saved by save_checkpoint. `abstract_state` is a
    template with the right pytree structure/shapes (e.g. a freshly created
    TrainState)."""
    step = step if step is not None else latest_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), str(step))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state))
