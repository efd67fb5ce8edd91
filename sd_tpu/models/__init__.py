from sd_tpu.models.autoencoder import AutoencoderKL, IdentityFirstStage, VQModel
from sd_tpu.models.codec import Decoder, Encoder
from sd_tpu.models.discriminator import ActNorm, NLayerDiscriminator
from sd_tpu.models.lpips import LPIPS
from sd_tpu.models.quantize import (
    EmaCodebook,
    GumbelQuantize,
    VectorQuantizer,
    VectorQuantizerOneHot,
    ema_quantize,
)
from sd_tpu.models.unet_ddpm import UNetDDPM
from sd_tpu.models.unet_sd import AttentionPool2d, SelfAttentionBlock2D, UNetModel
from sd_tpu.models.clip_text import (
    ClipTextConfig,
    ClipTextTransformer,
    FrozenClipTextEmbedder,
)
from sd_tpu.models.conditioners import (
    BERTEmbedder,
    BERTTokenizerHost,
    ClassEmbedder,
    FrozenClipImageEmbedder,
    SpatialRescaler,
    TransformerEmbedder,
)
