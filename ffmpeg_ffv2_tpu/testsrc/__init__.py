from .videogen import vsynth1_frames, vsynth3_frames, rgb24_to_yuv420p
from .rotozoom import rotozoom_frames
