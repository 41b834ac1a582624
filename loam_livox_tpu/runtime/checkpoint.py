"""Checkpoint / resume of the odometry state — the TPU-native
counterpart of the reference's "maps saving and reload" (reference:
``Points_cloud_map::save_to_file`` / ``load_mapping_from_file``,
``cell_map_keyframe.hpp:818-960``; README.md:9).

Two formats:

* **orbax** array checkpoint of the full `OdometryState` pytree —
  byte-exact resume of pose, history, cell maps, and matching buffer
  (the TPU-native path; use for crash recovery / session splits),
* the reference-compatible **JSON cell map** via `io.serialization`
  for interop (`export_reference_map`).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from .odometry import OdometryState, init_state


def save_state(state: OdometryState, path: str) -> None:
    """Write an orbax checkpoint of the state pytree."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def load_state(path: str, cfg) -> OdometryState:
    """Restore a state checkpoint; `cfg` must match the capacities the
    checkpoint was written with (shapes are validated)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = jax.device_get(init_state(cfg))
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=template)
    ref = init_state(cfg)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(ref)):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"checkpoint shape {np.shape(a)} != config shape "
                f"{np.shape(b)} — capacities differ")
    return jax.tree_util.tree_map(
        lambda a, b: jax.device_put(np.asarray(a).astype(b.dtype)),
        restored, ref)


def export_reference_map(state: OdometryState, path: str) -> int:
    """Dump the plane cell map in the reference's JSON schema."""
    from ..io.serialization import save_cell_map_json

    return save_cell_map_json(state.cell_planes, path)
