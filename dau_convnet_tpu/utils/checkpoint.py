"""Checkpoint/restore for DAU model state (Orbax).

The reference has no checkpoint subsystem (TF variables checkpoint through
standard TF savers; pretrained Caffe models ship as gists, reference
README.md:32-35). The TPU-native equivalent: Orbax on the flax param pytree
{weights: [1,S,G,F], mu1, mu2, sigma: [1], bias: [F]} - works transparently
with sharded (multi-chip) state.
"""

from __future__ import annotations

import os
import typing as tp

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(directory: str, step: int, state: tp.Any,
                    max_to_keep: int = 3) -> None:
    """Save a pytree (params / TrainState) at `step` under `directory`."""
    import orbax.checkpoint as ocp
    os.makedirs(directory, exist_ok=True)
    with _manager(directory, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_checkpoint(directory: str, state_like: tp.Any,
                       step: tp.Optional[int] = None) -> tp.Any:
    """Restore the pytree saved at `step` (default: latest). `state_like`
    provides structure/shardings (abstract values are fine)."""
    import orbax.checkpoint as ocp
    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_like)
        return mgr.restore(step, args=ocp.args.StandardRestore(target))


def latest_step(directory: str) -> tp.Optional[int]:
    import orbax.checkpoint as ocp
    with _manager(directory) as mgr:
        return mgr.latest_step()
