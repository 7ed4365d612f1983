from tpu_unet.utils.profiling import StepTimer, trace_capture
from tpu_unet.utils.debug import enable_nan_checks, debug_flags
