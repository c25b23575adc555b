"""TPU-native BLIP-2 / InstructBLIP model family."""
from cullavo_tpu.models.blip2.config import (Blip2Config, Blip2VisionConfig,
                                             OptConfig, QFormerConfig,
                                             instructblip_vicuna7b_config,
                                             tiny_blip2_config)
from cullavo_tpu.models.blip2.modeling import (blip2_forward, blip2_generate,
                                               encode_image, import_blip2_torch,
                                               init_blip2_params)
