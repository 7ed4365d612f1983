from tpu_unet.infer.tiles import TileInference
from tpu_unet.infer.tester import evaluate, export_predictions
