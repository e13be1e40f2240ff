from .params import FFV1Config, FFV1Params, CODER_GOLOMB, CODER_RANGE_DEFAULT, CODER_RANGE_CUSTOM
from .encoder import FFV1Encoder
from .decoder import FFV1Decoder
