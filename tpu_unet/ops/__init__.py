from tpu_unet.ops.edt import edt, edt_batch
from tpu_unet.ops.phase import (
    depth_to_space,
    phase_pack_kernel,
    phase_pack_kernel_jnp,
    phase_pool,
    phase_upconv_weights,
    space_to_depth,
)
from tpu_unet.ops.cc import connected_components, component_planes
from tpu_unet.ops.morphology import dilate, binary_threshold
from tpu_unet.ops.pad import reflect_pad, fold_reflect
from tpu_unet.ops.warp import (
    gaussian_kernel1d,
    gaussian_filter,
    map_coordinates_bilinear,
    rotate_about_center,
    elastic_fields,
)
