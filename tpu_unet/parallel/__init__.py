from tpu_unet.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    make_dp_train_step,
    make_dp_tile_forward,
)
from tpu_unet.parallel.halo import (
    halo_strip_inference,
    make_dp_halo_train_step,
    make_halo_train_step,
)
from tpu_unet.parallel.distributed import initialize_multihost
