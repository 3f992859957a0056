from vima_tpu.nn.vit import (
    ViTEncoder,
    ViTEncoderRectangular,
    GatoViTEncoder,
    VIMA_IMG_MEAN,
    VIMA_IMG_STD,
)
from vima_tpu.nn.obj_encoder import (
    ObjEncoder,
    GatoMultiViewRGBEncoder,
    MultiViewRGBEncoder,
    MultiViewRGBPerceiverEncoder,
)
from vima_tpu.nn.t5 import T5EncoderStack, T5Config, T5PromptEncoder
from vima_tpu.nn.word_embedding import WordEmbedding
from vima_tpu.nn.xattn_gpt import XAttnGPT
from vima_tpu.nn.gpt import GPTDecoder
from vima_tpu.nn.action import (
    ActionEmbedding,
    ContinuousActionEmbedding,
    ActionDecoder,
)
from vima_tpu.nn.perceiver import PerceiverResampler
from vima_tpu.ops.layers import MLP

__all__ = [
    "ViTEncoder",
    "ViTEncoderRectangular",
    "GatoViTEncoder",
    "VIMA_IMG_MEAN",
    "VIMA_IMG_STD",
    "ObjEncoder",
    "GatoMultiViewRGBEncoder",
    "MultiViewRGBEncoder",
    "MultiViewRGBPerceiverEncoder",
    "T5EncoderStack",
    "T5Config",
    "T5PromptEncoder",
    "WordEmbedding",
    "XAttnGPT",
    "GPTDecoder",
    "ActionEmbedding",
    "ContinuousActionEmbedding",
    "ActionDecoder",
    "PerceiverResampler",
    "MLP",
]
