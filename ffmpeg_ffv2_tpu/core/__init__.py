from .crc import crc32_ieee, CRC32_IEEE_TABLE
