"""Minimal AVI reader/writer for FFV1/FFV2 interop.

The reader handles files produced by the reference mux path
(libavformat/avienc.c): RIFF/AVI header list with one video stream, a movi
list of 00dc chunks, and an idx1 index.  The writer produces the same layout
(bit-exact AVI output parity is tracked as a separate milestone).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


def _u32(b, off):
    return struct.unpack_from("<I", b, off)[0]


@dataclass
class AviStream:
    fcc_type: str = ""
    fcc_handler: str = ""
    width: int = 0
    height: int = 0
    rate: int = 25
    scale: int = 1
    extradata: bytes = b""
    packets: list = field(default_factory=list)


class AviReader:
    def __init__(self, data: bytes):
        self.data = data
        self.streams: list[AviStream] = []
        self._parse()

    def _parse(self):
        d = self.data
        if d[0:4] != b"RIFF" or d[8:12] != b"AVI ":
            raise ValueError("not an AVI file")
        self._walk(12, len(d))

    def _walk(self, off: int, end: int, in_strl=False):
        d = self.data
        cur_stream = None
        while off + 8 <= end:
            fourcc = d[off:off + 4]
            size = _u32(d, off + 4)
            body = off + 8
            if fourcc == b"LIST":
                list_type = d[body:body + 4]
                if list_type == b"strl":
                    cur_stream = AviStream()
                    self.streams.append(cur_stream)
                    self._parse_strl(body + 4, body + size, cur_stream)
                elif list_type == b"movi":
                    self._parse_movi(body + 4, body + size)
                else:
                    self._walk(body + 4, body + size)
            off = body + size + (size & 1)

    def _parse_strl(self, off: int, end: int, st: AviStream):
        d = self.data
        while off + 8 <= end:
            fourcc = d[off:off + 4]
            size = _u32(d, off + 4)
            body = off + 8
            if fourcc == b"strh":
                st.fcc_type = d[body:body + 4].decode("ascii", "replace")
                st.fcc_handler = d[body + 4:body + 8].decode("ascii", "replace")
                st.scale = _u32(d, body + 20)
                st.rate = _u32(d, body + 24)
            elif fourcc == b"strf" and st.fcc_type == "vids":
                # BITMAPINFOHEADER: biSize is the header size incl. extradata
                # biSize = 40 + unpadded extradata size (riffenc.c); the
                # chunk may carry one extra alignment byte beyond it
                bi_size = _u32(d, body)
                st.width = struct.unpack_from("<i", d, body + 4)[0]
                st.height = abs(struct.unpack_from("<i", d, body + 8)[0])
                ed_end = min(body + max(bi_size, 40), body + size)
                if ed_end > body + 40:
                    st.extradata = d[body + 40:ed_end]
            off = body + size + (size & 1)

    def _parse_movi(self, off: int, end: int):
        d = self.data
        while off + 8 <= end:
            fourcc = d[off:off + 4]
            size = _u32(d, off + 4)
            body = off + 8
            if fourcc == b"LIST":
                self._parse_movi(body + 4, body + size)
            elif len(fourcc) == 4 and fourcc[2:4] in (b"dc", b"db", b"wb"):
                sid = int(fourcc[0:2])
                while len(self.streams) <= sid:
                    self.streams.append(AviStream())
                self.streams[sid].packets.append(d[body:body + size])
            off = body + size + (size & 1)

    @property
    def video(self) -> AviStream:
        for s in self.streams:
            if s.fcc_type == "vids" or s.packets:
                return s
        raise ValueError("no video stream")


class AviWriter:
    """Single-video-stream AVI writer (layout mirrors avienc.c)."""

    def __init__(self, width: int, height: int, fourcc: str = "FFV1",
                 fps: tuple[int, int] = (25, 1), extradata: bytes = b""):
        self.width = width
        self.height = height
        self.fourcc = fourcc
        self.fps = fps
        self.extradata = extradata
        self.packets: list[tuple[bytes, bool]] = []

    def write_packet(self, data: bytes, keyframe: bool = True):
        self.packets.append((data, keyframe))

    def _chunk(self, fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def _list(self, list_type: bytes, body: bytes) -> bytes:
        return self._chunk(b"LIST", list_type + body)

    def getvalue(self) -> bytes:
        n = len(self.packets)
        rate, scale = self.fps

        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", self.fourcc.encode(), 0, 0, 0, 0,
            scale, rate, 0, n, 1024 * 1024, 0xFFFFFFFF, 0,
            0, 0, self.width, self.height)
        bih = struct.pack(
            "<IiiHH4sIiiII",
            40 + len(self.extradata), self.width, self.height, 1, 24,
            self.fourcc.encode(), self.width * self.height * 3, 0, 0, 0, 0)
        strf = bih + self.extradata
        strl = self._list(b"strl",
                          self._chunk(b"strh", strh)
                          + self._chunk(b"strf", strf))
        usec_per_frame = int(1000000 * scale / rate) if rate else 0
        max_bytes = max((len(p) for p, _ in self.packets), default=0)
        avih = struct.pack(
            "<IIIIIIIIIIIIII",
            usec_per_frame, 0, 0, 0x10, n, 0, 1, max_bytes,
            self.width, self.height, 0, 0, 0, 0)
        hdrl = self._list(b"hdrl", self._chunk(b"avih", avih) + strl)

        movi_body = b"movi"
        offsets = []
        pos = 4
        for data, _ in self.packets:
            offsets.append(pos)
            chunk = self._chunk(b"00dc", data)
            movi_body += chunk
            pos += len(chunk)
        movi = self._chunk(b"LIST", movi_body)

        idx = b""
        for (data, key), off in zip(self.packets, offsets):
            idx += struct.pack("<4sIII", b"00dc", 0x10 if key else 0,
                               off, len(data))
        idx1 = self._chunk(b"idx1", idx)

        riff_body = b"AVI " + hdrl + movi + idx1
        return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    def save(self, path: str):
        with open(path, "wb") as f:
            f.write(self.getvalue())
