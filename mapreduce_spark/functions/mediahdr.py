"""Pure-Python image container builders + header parser (public specs).

No codec library ships in this container, but PNG and JPEG dimensions
live in well-documented header structures, so the decode step can be
real without PIL:

- PNG (https://www.w3.org/TR/png-3/): 8-byte signature, then chunks of
  ``len(4, big-endian) | type(4) | data | crc32(type+data)``. The first
  chunk MUST be IHDR whose first 8 data bytes are width,height as
  big-endian u32. We verify the signature AND the IHDR CRC, so a
  corrupted header is rejected, not half-read.
- JPEG (ITU-T T.81 / JFIF): a stream of ``0xFF``-prefixed marker
  segments after SOI (FFD8); frame dimensions are in the SOFn segment
  (FFC0-FFCF minus DHT/DAC/RST) as precision(1), height(2), width(2)
  big-endian. We walk segments until a SOF, as any header parser must.

The builders emit minimal-but-valid containers (PNG: 8-bit grayscale
IHDR+IDAT+IEND with correct CRCs and a real zlib-compressed scanline
body; JPEG: SOI+SOF0+EOI) used as deterministic decode fixtures.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# SOFn markers that carry frame dimensions: C0-CF except C4 (DHT),
# C8 (JPG extension), CC (DAC).
_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def build_png(width: int, height: int) -> bytes:
    """A valid 8-bit grayscale PNG of the given dimensions; pixel (x,y)
    is ``(31*x + 17*y) % 256`` so the body varies with the dims."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((31 * x + 17 * y) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def build_jpeg(width: int, height: int) -> bytes:
    """A minimal JPEG header stream: SOI, a single-component baseline
    SOF0 carrying the dimensions, EOI. Enough for any header parser;
    no entropy-coded scan (fixtures test the header path only)."""
    sof_payload = struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0))
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + sof + b"\xff\xd9"


def parse_dims(b: bytes) -> tuple[str, str | None, int | None, int | None]:
    """(status, fmt, width, height) from raw container bytes.

    status is 'ok' on a well-formed header, else 'error:<why>' with NULL
    dims — the operator surfaces it as a column rather than raising, so
    one corrupt blob can't fail a 100 TB decode job.
    """
    if b[:8] == PNG_SIG:
        if len(b) < 33 or b[12:16] != b"IHDR":
            return "error:png-truncated", "png", None, None
        (crc,) = struct.unpack(">I", b[29:33])
        if zlib.crc32(b[12:29]) & 0xFFFFFFFF != crc:
            return "error:png-bad-crc", "png", None, None
        width, height = struct.unpack(">II", b[16:24])
        return "ok", "png", width, height
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return "error:jpeg-bad-marker", "jpeg", None, None
            marker = b[i + 1]
            if marker == 0xD9:  # EOI before any SOF
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # bare markers
                i += 2
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker in _SOF_MARKERS:
                if i + 9 > len(b):
                    return "error:jpeg-truncated", "jpeg", None, None
                height, width = struct.unpack(">HH", b[i + 5 : i + 9])
                return "ok", "jpeg", width, height
            i += 2 + seglen
        return "error:jpeg-no-sof", "jpeg", None, None
    return "error:unknown-format", None, None, None
