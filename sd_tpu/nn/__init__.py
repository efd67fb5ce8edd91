from sd_tpu.nn.layers import (
    GroupNorm32,
    timestep_embedding,
    zeros_init_conv,
    mean_flat,
)
from sd_tpu.nn.resnet import ResnetBlock, ResBlockSD
from sd_tpu.nn.updown import Upsample, Downsample
from sd_tpu.nn.attention import (
    AttnBlock,
    LinearAttention,
    make_attn,
    CrossAttention,
    BasicTransformerBlock,
    SpatialTransformer,
    FeedForwardGEGLU,
)
