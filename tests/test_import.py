"""Importing the package must never initialise a JAX backend.

The TPU chip in this environment is single-client and a session grab costs
~60-115 s, so a module-level ``jnp`` constant anywhere in ``tpu_unet`` turns
*every* import — including ones that only want the host-side helpers — into a
TPU claim, and into an import-time crash whenever the chip is held by another
process (observed: ``ops/cc.py``'s former ``jnp.int32`` sentinel taking down
``scripts/tpu_bwd_attrib.py`` before it reached its own backend setup).

Run in a subprocess so the check isn't poisoned by the test session's own
backend use.
"""

import subprocess
import sys


_PROBE = """
import jax
jax.config.update("jax_platforms", "cpu")

import tpu_unet
import tpu_unet.core.geometry
import tpu_unet.ops
import tpu_unet.losses
import tpu_unet.models
import tpu_unet.data.augment
import tpu_unet.data.ingest
import tpu_unet.train.trainer
import tpu_unet.infer.tester
import tpu_unet.infer.quant
import tpu_unet.parallel.halo
import tpu_unet.utils.profiling

from jax._src import xla_bridge

initialized = sorted(xla_bridge._backends)
assert not initialized, f"import initialised backend(s): {initialized}"
print("IMPORT_CLEAN")
"""


def test_package_import_initialises_no_backend():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "IMPORT_CLEAN" in proc.stdout
