from tpu_unet.data.ingest import (
    SegmentationData,
    preprocess_gt,
    crop_distribution,
    load_ctc_training,
    load_ctc_test,
    load_isbi_training,
)
from tpu_unet.data.synthetic import synthetic_dataset
from tpu_unet.data.augment import AugmentPipeline
