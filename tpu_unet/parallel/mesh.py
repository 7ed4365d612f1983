"""Device mesh + data-parallel sharding.

The reference has no distributed machinery at all (single ``cuda:0``,
``main_main.py:157-167``; SURVEY.md §2.14). The TPU-native equivalent of the
role NCCL/DDP would play: a ``jax.sharding.Mesh`` over the slice, batch
sharded on the ``data`` axis, parameters replicated, and XLA inserting the
gradient all-reduce over ICI — no hand-written collectives in the train step
(the scaling-book recipe: annotate shardings, let the compiler place psums).

Axes:
  data    — batch parallelism for training (BASELINE config 5: wider bf16
            U-Net data-parallel across a v5e-8 slice) and for tile batches
            at inference (config 4).
  spatial — strip parallelism over image rows with halo exchange
            (parallel/halo.py), the convnet counterpart of sequence/context
            parallelism. TP/PP/EP have no workload in a 23-layer convnet and
            are intentionally out of scope (SURVEY.md §2.14).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh over the first `num_devices` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) axis of every leaf over `axis`."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def make_dp_train_step(model, weight_fn, broadcast: str, tx, mesh: Mesh,
                       axis: str = "data"):
    """Data-parallel fused train step.

    Same math as train.trainer.make_train_step; shardings constrain the batch
    to the `data` axis and the state to full replication, and XLA emits the
    grad all-reduce (the global-batch mean couples shards) over ICI.
    """
    from tpu_unet.train.trainer import make_train_step

    base = make_train_step(model, weight_fn, broadcast, tx)
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))
    # Outer jit re-stages the (already jitted) step with explicit shardings:
    # batch on `data`, state replicated, per-sample metrics back on `data`;
    # loss is a replicated scalar (the global-batch mean forces the psum).
    return jax.jit(
        base,
        in_shardings=(state_sh, batch_sh, batch_sh),
        out_shardings=(state_sh, state_sh, batch_sh),
    )


def make_dp_tile_forward(model, mesh: Mesh, axis: str = "data"):
    """Mesh-sharded batched tile forward for overlap-tile inference at scale
    (BASELINE config 4: tile batches sharded across the mesh)."""
    batch_sh = NamedSharding(mesh, P(axis))
    state_sh = NamedSharding(mesh, P())

    def fwd(params, tiles):
        logits = model.apply(params, tiles)
        return jnp.argmax(logits, axis=-1)

    return jax.jit(fwd, in_shardings=(state_sh, batch_sh),
                   out_shardings=batch_sh)
