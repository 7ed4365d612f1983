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
import threading
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
        self._lock = threading.Lock()
        # tag -> newest not-yet-started (device_state, host_state); replaced
        # in place by save_async so superseded states are RELEASED, never
        # queued (see save_async docstring for why queueing leaks HBM)
        self._next: Dict[str, Tuple[Any, Dict[str, Any]]] = {}
        self._inflight: Dict[str, Any] = {}  # tag -> drain Future

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
        """Queue a save without blocking the training loop — latest-wins
        per tag, with superseded states RELEASED immediately.

        Each tag has one slot holding the newest pending state; a new save
        overwrites it (dropping the old device-state reference) and the
        worker drains whatever is newest when it gets there. This bounds
        device memory at ~2 pinned states per tag regardless of how far
        epochs outrun the device->host fetch.

        Why not cancel-and-resubmit futures: a cancelled ThreadPoolExecutor
        work item stays in the executor's queue — holding its args — until
        the worker dequeues and discards it. With ~25 s per save over the
        tunnel and sub-second epochs, that retained one full device state
        (params+momentum, ~250 MB / ~96 arrays) per epoch and exhausted TPU
        HBM at epoch ~122 of the round-4 recipe run
        (results/r4/recipe_train.log; reproduced + isolated in
        results/r4/leak_probe_C.txt with exactly this growth signature).
        """
        with self._lock:
            self._next[tag] = (device_state, dict(host_state))
            f = self._inflight.get(tag)
            if f is None or f.done():
                self._inflight[tag] = self._executor.submit(self._drain, tag)

    def _drain(self, tag: str) -> None:
        while True:
            with self._lock:
                item = self._next.pop(tag, None)
            if item is None:
                return
            self.save(tag, *item)

    def wait(self) -> None:
        """Drain queued async saves (re-raises the first failure)."""
        err = None
        while True:
            with self._lock:
                futures = list(self._inflight.items())
            for _, f in futures:
                try:
                    f.result()
                except Exception as e:  # noqa: BLE001 — re-raised below
                    if err is None:
                        err = e
            with self._lock:
                # a save_async racing a finishing _drain can leave its slot
                # filled with no live worker: restart drains until empty
                stranded = [t for t in self._next
                            if (self._inflight.get(t) is None
                                or self._inflight[t].done())]
                for t in stranded:
                    self._inflight[t] = self._executor.submit(self._drain, t)
                done = (not self._next
                        and all(f.done() for f in self._inflight.values()))
                if done:
                    self._inflight = {}
            if done:
                if err is not None:
                    raise err
                return

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
