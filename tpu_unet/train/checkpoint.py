"""Checkpoint / resume via Orbax.

The reference saves bare ``state_dict`` weights and *loses optimizer and
scheduler state* (SURVEY.md §5.4); its resume path is stale/broken as shipped
(``main_main.py:202-205, 244-249`` parse filenames the trainer never writes).
Here a checkpoint is the complete training state — params, SGD momentum +
injected LR, epoch, plateau-scheduler state, best-loss bookkeeping — under
the same best/latest/goal policy (``trainer.py:139-146, 185-221``), so
preemption recovery is exact.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class Checkpointer:
    """Filesystem checkpoints: one directory per tag (best/latest/goal-*).

    Device pytrees (params, opt_state) go through Orbax; small host-side
    scalars (epoch, plateau state, best loss) ride a JSON sidecar.

    `save_async` streams the device->host fetch + write on a single worker
    thread (JAX arrays are immutable, so snapshotting by reference is safe) —
    on remote-tunnel backends a blocking save costs ~25 s per 31M-param model
    and would dominate epoch time. Writes per tag stay ordered (one worker);
    `wait()` drains before restore/exit.
    """

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()
        self._executor = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="ckpt")
        self._pending: Dict[str, Any] = {}

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, device_state: Any, host_state: Dict[str, Any]) -> str:
        path = self._path(tag)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        self._ckptr.save(tmp, _tree_to_numpy(device_state))
        self._ckptr.wait_until_finished()
        with open(os.path.join(tmp, "host_state.json"), "w") as f:
            json.dump(host_state, f)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.rename(tmp, path)
        return path

    def save_async(self, tag: str, device_state: Any,
                   host_state: Dict[str, Any]) -> None:
        """Queue a save without blocking the training loop.

        Latest-wins per tag: if a save for the same tag is still queued (not
        yet started), it is cancelled and replaced. Without this, fast epochs
        outpace the device->host drain and every queued save pins its (stale)
        device state tree — unbounded queueing exhausted HBM at ~150 epochs in
        testing. At most one queued + one in-flight save per tag survive.
        """
        prev = self._pending.get(tag)
        if prev is not None and not prev.done():
            prev.cancel()  # no-op if already running; superseded if queued
        self._pending[tag] = self._executor.submit(
            self.save, tag, device_state, dict(host_state))

    def wait(self) -> None:
        """Drain queued async saves (re-raises the first failure)."""
        for f in self._pending.values():
            if not f.cancelled():
                f.result()
        self._pending = {}

    def restore(self, tag: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
        self.wait()
        path = self._path(tag)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), template
        )
        device_state = self._ckptr.restore(path, abstract)
        with open(os.path.join(path, "host_state.json")) as f:
            host_state = json.load(f)
        return device_state, host_state

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))

    def latest_tag(self) -> Optional[str]:
        if self.exists("latest"):
            return "latest"
        return None
