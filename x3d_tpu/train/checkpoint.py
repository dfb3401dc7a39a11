"""Checkpoint save / resume on Orbax.

Reference counterparts: Keras ``ModelCheckpoint`` writing ``ckpt-{epoch}``
every epoch *or every N steps* (``utils.py:128-132``, ``--save_checkpoints_step``
at ``train.py:24``), resume by parsing the epoch out of the latest filename
(``train.py:131-137``), pretrained warm-start (``train.py:138-143``), and
eval's tolerant restore (``eval.py:78-81``).

Here the save key is an arbitrary monotonically-increasing integer — the
training CLI keys by the **global optimizer step** so both epoch-end and
mid-epoch (step-cadence) saves coexist in one manager and resume recovers
the exact (epoch, step-in-epoch) point from the restored ``state.step``
(no filename parsing).  The checkpoint holds the *entire* functional state
(params, BN stats, optimizer slots, step counter), and restores are
sharding-aware: when a mesh is passed, arrays restore directly into their
NamedSharding layout.
"""

from __future__ import annotations

import logging
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
    """TrainState checkpoint manager (keys: any increasing int save id)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, key: int, state) -> None:
        """Persist the full train state under an integer save id.

        The training CLI uses the global optimizer step as the key; the
        historical epoch-keyed layout restores identically (resume reads
        the epoch/step from the restored ``state.step``, never the key).
        """
        self._mgr.save(
            key,
            args=ocp.args.StandardSave(_state_to_pytree(state)),
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        """Latest save key (named for the historical epoch-keyed layout)."""
        return self._mgr.latest_step()

    latest = latest_epoch

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into a template TrainState (shapes/shardings from it).

        Returns (state, key); (state, 0) if nothing to restore.  Callers
        should derive the resume point from ``state.step`` (the global
        optimizer step), not from the key.
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
        except (ValueError, KeyError, TypeError) as e:
            # Optimizer tree-structure mismatch (e.g. eval built with a
            # different optimizer than the checkpoint wrote): fall back to
            # a template-free restore and take only the weights.  The
            # exception is logged so a genuinely corrupt checkpoint (which
            # the template-free restore will also reject) is
            # distinguishable in the logs from a benign slot mismatch.
            logging.getLogger(__name__).warning(
                "Templated checkpoint restore failed (%s: %s); retrying "
                "without a template for a weights-only load.",
                type(e).__name__, e)
            restored = mgr._mgr.restore(epoch)
        return state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )

    def close(self) -> None:
        self._mgr.close()
