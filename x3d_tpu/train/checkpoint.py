"""Checkpoint save / resume on Orbax.

Reference counterparts: Keras ``ModelCheckpoint`` writing ``ckpt-{epoch}``
every epoch (``utils.py:128-132``), resume by parsing the epoch out of the
latest filename (``train.py:131-137``), pretrained warm-start
(``train.py:138-143``), and eval's tolerant restore (``eval.py:78-81``).

Here the epoch is first-class step metadata (no filename parsing), the
checkpoint holds the *entire* functional state (params, BN stats, optimizer
slots, step counter), and restores are sharding-aware: when a mesh is
passed, arrays restore directly into their NamedSharding layout.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _state_to_pytree(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


class CheckpointManager:
    """Epoch-granular checkpoint manager for TrainState."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, state) -> None:
        """Persist the full train state under the (1-based) epoch number."""
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(_state_to_pytree(state)),
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into a template TrainState (shapes/shardings from it).

        Returns (state, epoch); (state, 0) if nothing to restore.
        """
        epoch = epoch if epoch is not None else self.latest_epoch()
        if epoch is None:
            return state, 0
        template = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, _state_to_pytree(state)
        )
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)
        )
        return (
            state.replace(
                step=restored["step"],
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
            ),
            int(epoch),
        )

    def restore_weights_only(self, state, directory: Optional[str] = None,
                             epoch: Optional[int] = None):
        """Load params + batch_stats, keep fresh optimizer state.

        The analogue of the reference's pretrained warm start
        (``train.py:138-143``) and eval's ``.expect_partial()``
        (``eval.py:81``): optimizer slots in the checkpoint are ignored.
        """
        mgr = self if directory is None else CheckpointManager(directory)
        epoch = epoch if epoch is not None else mgr.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(
                f"No checkpoint found in {mgr._dir}"
            )
        try:
            template = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, _state_to_pytree(state)
            )
            restored = mgr._mgr.restore(
                epoch, args=ocp.args.StandardRestore(template)
            )
        except Exception:
            # optimizer structure mismatch (e.g. eval built with a different
            # optimizer than the checkpoint): restore without a template and
            # take only the weights
            restored = mgr._mgr.restore(epoch)
        return state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )

    def close(self) -> None:
        self._mgr.close()
