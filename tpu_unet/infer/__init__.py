from tpu_unet.infer.tiles import TileInference
from tpu_unet.infer.tester import evaluate, export_predictions
from tpu_unet.infer.quant import (
    QuantInference,
    build_quant_inference,
    load_quant_params,
    save_quant_params,
)
