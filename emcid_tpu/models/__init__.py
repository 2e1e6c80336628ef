from emcid_tpu.models.configs import (
    CLIPTextConfig,
    UNetConfig,
    VAEConfig,
    SD_V14_TEXT,
    SDXL_TEXT_1,
    SDXL_TEXT_2,
    TINY_TEXT,
    sd_v14_unet,
    sdxl_unet,
    tiny_unet,
    sd_vae,
    tiny_vae,
)
from emcid_tpu.models.clip_text import CLIPTextEncoder, TextOutput
from emcid_tpu.models.inception import (
    InceptionV3Features,
    fid_features,
    inception_from_torch,
    load_inception,
    make_fid_extractor,
)
