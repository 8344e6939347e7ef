"""Checkpoint save/restore on top of Orbax.

First-class trainer feature (the reference has minimal best-loss
``torch.save`` + ``epoch_awoken`` resume, 06_.../02_train_direct.py:40-49,
85-88). Stores params + opt state + step as one pytree; keeps a
``best``-tagged copy mirroring the reference's best-train-loss policy.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None, None
        if template is not None:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        else:
            state = self._mgr.restore(step)
        return state, step

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


class PreemptionGuard:
    """Save-on-preemption hook (SURVEY §5: failure detection).

    TPU preemption delivers SIGTERM; a context-managed guard flips
    ``should_stop`` so the training loop can checkpoint and exit cleanly
    at the next step boundary instead of dying mid-epoch:

        with PreemptionGuard() as guard:
            for epoch in ...:
                if guard.should_stop:
                    ckpt.save(epoch, state, force=True)
                    break

    Handlers are installed on entry and restored on exit; outside the main
    thread (where signal.signal raises) the guard degrades to an inert
    flag, so library code can use it unconditionally.
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self._signals = signals or (_signal.SIGTERM,)
        self._previous = {}
        self.should_stop = False

    def __enter__(self):
        def handler(signum, frame):
            self.should_stop = True

        for s in self._signals:
            try:
                self._previous[s] = self._signal.signal(s, handler)
            except ValueError:  # not the main thread
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            self._signal.signal(s, prev)
        return False
