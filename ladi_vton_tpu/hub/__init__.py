from ladi_vton_tpu.hub.convert import (
    convert_clip_text,
    convert_clip_vision,
    convert_emasc,
    convert_inversion_adapter,
    convert_refinement,
    convert_tps,
    convert_unet,
    convert_vae,
    convert_vgg19,
    widen_conv_in,
)
