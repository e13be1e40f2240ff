from .avi import AviReader, AviWriter
