from .avi import AviReader, AviWriter
from .matroska import MatroskaReader, MatroskaWriter
from .rawvideo import RawVideoReader, RawVideoWriter
