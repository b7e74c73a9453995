from maskbit_tpu.nn.conv import ConvDecoder, ConvEncoder, DownsamplingStage, ResidualBlock, ResidualStage, UpsamplingStage
from maskbit_tpu.nn.discriminator import NLayerDiscriminatorv2, OriginalNLayerDiscriminator, create_discriminator
from maskbit_tpu.nn.transformer import BertAttention, BertFeedForward, MultiHeadSelfAttention, TransformerEncoder

__all__ = [
    "ConvEncoder", "ConvDecoder", "ResidualBlock", "ResidualStage",
    "DownsamplingStage", "UpsamplingStage",
    "NLayerDiscriminatorv2", "OriginalNLayerDiscriminator", "create_discriminator",
    "TransformerEncoder", "BertAttention", "BertFeedForward", "MultiHeadSelfAttention",
]
