"""Pure-python PNG codec — the vendored middle tier between real
Pillow and the arithmetic fakes (round-3 verdict "Next round" #6).

Only stdlib (zlib/struct), so real PNG bytes decode end-to-end in this
container where Pillow is absent: 8-bit-depth gray / gray+alpha / RGB
/ RGBA, non-interlaced, all five scanline filters (PNG spec §6,
https://www.w3.org/TR/png-3/). The encoder writes filter-0 scanlines —
valid minimal PNG, decodable by any conformant reader. Scope is
deliberately bounded: 16-bit depth, palettes, and Adam7 interlace
raise NotImplementedError (honest limits, never silent garbage);
production installs Pillow and takes the faster tier.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> channel count (palette type 3 unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_SIGNATURE


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, raster) where raster is
    row-major interleaved 8-bit samples."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (length,), typ = (
            struct.unpack(">I", payload[pos : pos + 4]),
            payload[pos + 4 : pos + 8],
        )
        pos += 8
        # never trust the declared length: a truncated or corrupt
        # stream must surface as the documented ValueError, not a
        # struct/zlib error from deep inside (ADVICE r4)
        if length > len(payload) - pos - 4:
            raise ValueError(
                f"malformed PNG: {typ!r} chunk declares {length} bytes "
                f"but only {max(len(payload) - pos - 4, 0)} remain"
            )
        data = payload[pos : pos + length]
        (crc,) = struct.unpack(">I", payload[pos + length : pos + length + 4])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"malformed PNG: {typ!r} chunk CRC mismatch")
        pos += length + 4
        if typ == b"IHDR":
            if length != 13:
                raise ValueError(
                    f"malformed PNG: IHDR length {length} != 13"
                )
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("malformed PNG: no IHDR chunk")
    if depth != 8 or ctype not in _CHANNELS:
        raise NotImplementedError(
            f"pure-python tier supports 8-bit gray/RGB/alpha PNGs only "
            f"(got depth={depth}, color_type={ctype})"
        )
    if interlace:
        raise NotImplementedError("Adam7 interlace not supported")
    ch = _CHANNELS[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"malformed PNG: IDAT inflate failed ({exc})") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("malformed PNG: IDAT size does not match dimensions")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"malformed PNG: invalid scanline filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(raster: bytes, width: int, height: int, channels: int) -> bytes:
    """Row-major interleaved 8-bit raster -> PNG bytes (filter 0)."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(raster) != height * stride:
        raise ValueError("raster size does not match dimensions")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    raw = b"".join(
        b"\x00" + raster[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    raster: bytes,
    width: int,
    height: int,
    channels: int,
    out_width: int,
    out_height: int,
) -> bytes:
    """Nearest-neighbor raster resize (deterministic, codec-free)."""
    out = bytearray(out_width * out_height * channels)
    for y in range(out_height):
        sy = min(y * height // out_height, height - 1)
        src_row = sy * width * channels
        dst_row = y * out_width * channels
        for x in range(out_width):
            sx = min(x * width // out_width, width - 1)
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = raster[s : s + channels]
    return bytes(out)
