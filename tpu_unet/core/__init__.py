from tpu_unet.core.geometry import (
    input_size_for_output,
    output_size_for_input,
    input_size_compute,
    valid_sizes,
    CONTEXT,
    TilePlan,
    plan_tiles,
)
