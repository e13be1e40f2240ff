from .packing import (unpack_bgr0, pack_bgr0, unpack_rgb48, pack_rgb48,
                      unpack_rgb32, pack_rgb32)
from .scale import (yuv420p_to_yuv422p10_neighbor,
                    yuv420p_to_yuv444p16_neighbor,
                    yuv422p10_to_yuv420p_neighbor,
                    yuv444p16_to_yuv420p_neighbor)
from .yuv_rgb import (yuv420p_to_bgr0, yuv420p_to_rgb48,
                      bgr0_to_yuv420p, rgb48_to_yuv420p,
                      gbrp16_to_yuv420p)
