from .codec import FFV2Encoder, FFV2Decoder, FFV2Config
from .entropy import DaalaEncoder, DaalaDecoder, DaalaCDF
