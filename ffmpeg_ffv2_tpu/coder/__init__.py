from .rac import (
    RangeEncoder,
    RangeDecoder,
    build_rac_states,
    DEFAULT_RAC_FACTOR,
    DEFAULT_RAC_MAX_P,
)
from .bitio import BitWriter, BitReader
from .golomb import (
    VlcState,
    LOG2_RUN,
    put_sr_golomb,
    get_sr_golomb,
    put_vlc_symbol,
    get_vlc_symbol,
    update_vlc_state,
)
