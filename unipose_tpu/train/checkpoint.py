"""Orbax checkpointing with a ``*_best`` pointer.

Reference behavior: best-metric-only ``torch.save({'state_dict': ...})`` to
``<name>_best.pth.tar`` (utils/utils.py:53-56; trigger unipose.py:183-186) —
no optimizer/step/RNG, so no true resume.  Here the full TrainState is saved
(params, batch_stats, opt_state, step, rng), giving exact resume for
preemptible TPU slices, while ``save_checkpoint(state, is_best, name)`` keeps
the reference's best-only external semantics.
"""

from __future__ import annotations

import os
import weakref
from typing import Optional

import jax
import orbax.checkpoint as ocp

from unipose_tpu.train.state import TrainState


def _as_path(directory: str) -> str:
    return os.path.abspath(os.path.expanduser(directory))


def save_train_state(directory: str, state: TrainState, *, force: bool = True) -> str:
    """Save the full train state under ``directory``."""
    path = _as_path(directory)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=force)
    return path


def restore_train_state(directory: str, template: TrainState) -> TrainState:
    """Restore a train state saved by :func:`save_train_state`."""
    path = _as_path(directory)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, jax.device_get(template))


def save_checkpoint(
    state: TrainState, is_best: bool, filename: str = "checkpoint"
) -> Optional[str]:
    """Reference-compatible best-only save (utils/utils.py:53-56): writes to
    ``<filename>_best`` only when ``is_best``."""
    if is_best:
        return save_train_state(f"{filename}_best", state)
    return None


# Live managers by directory.  A *new* manager's wait_until_finished() is a
# no-op for writes issued by a *different* instance over the same directory,
# so without this a same-process "save async, reopen, restore_latest" sequence
# could miss the just-saved step (cross-process is safe regardless: orbax
# commits via atomic rename, so an unfinished save is simply invisible and the
# fresh process resumes from the previous committed step).
_LIVE_MANAGERS: "weakref.WeakValueDictionary[str, CheckpointManager]" = (
    weakref.WeakValueDictionary()
)


class CheckpointManager:
    """Periodic checkpointing with retention + latest-restore — the
    preemption/auto-resume story the reference lacks (SURVEY §5.3).

    Saves are **async**: orbax snapshots arrays to host memory before
    ``save`` returns (so donating the state to the next train step is safe)
    and writes to disk in a background thread — the train loop never stalls
    on checkpoint IO.  ``wait()``/``close()`` block until pending writes
    commit (call before process exit; ``restore_latest`` also waits so a
    just-saved step is always visible, and opening a new manager over a
    directory another live manager is writing waits for its pending saves)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = _as_path(directory)
        prior = _LIVE_MANAGERS.get(self.directory)
        if prior is not None:
            prior.wait()
        # Keep a weak handle so saves the prior instance issues *after* this
        # construction are still waited on by wait()/restore_latest() (a new
        # manager's wait_until_finished is a no-op for another instance's
        # writes).  Weak so abandoned managers can still be collected.
        self._prior = weakref.ref(prior) if prior is not None else None
        _LIVE_MANAGERS[self.directory] = self
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        prior = self._prior() if self._prior is not None else None
        if prior is not None and prior is not self:
            prior._mgr.wait_until_finished()
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.wait()
        return self._mgr.latest_step()

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        self.wait()
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(template))
        )

    def close(self) -> None:
        self._mgr.close()


def warm_start_from_torch(
    state: TrainState, torch_path: str, *, variant: str = "image"
) -> TrainState:
    """Key-intersection warm start from a reference ``*.pth.tar``
    (unipose.py:78-90 semantics) via the compat converter."""
    from unipose_tpu.compat.torch_convert import convert_state_dict, load_torch_checkpoint

    torch_state = load_torch_checkpoint(torch_path)
    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    converted, report = convert_state_dict(torch_state, template, variant=variant)
    loaded, skipped = len(report["loaded"]), len(report["skipped"])
    print(f"warm start: loaded {loaded} tensors, skipped {skipped}")
    return state.replace(
        params=converted["params"], batch_stats=converted["batch_stats"]
    )
