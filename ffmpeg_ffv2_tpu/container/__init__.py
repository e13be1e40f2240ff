from .avi import AviReader, AviWriter
from .rawvideo import RawVideoReader, RawVideoWriter
