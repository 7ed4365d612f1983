from tpu_unet.models.unet import UNet, center_crop_or_pad
