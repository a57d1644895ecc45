"""From-scratch GIF87a/89a codec — real variable-width LZW.

Completes the codec family's algorithmic coverage: BMP/WAV are raw
containers, JPEG is the lossy DCT/entropy path, PNG the predictive-
filter + DEFLATE path, and GIF is DICTIONARY coding — LZW with
variable code width (9→12 bits), CLEAR/EOI control codes, dictionary
growth to 4096 with reset, LSB-first bit packing, and 255-byte
sub-block framing. All implemented from the spec (no codec library);
single-frame, 8-bit global palette, non-interlaced.

The decoder handles the classic cScSc edge (a code equal to the next
unassigned dictionary slot must be interpreted as prev + prev[0]) and
validates structure: magic, palette size, block framing, EOI presence,
pixel-count match. The encoder emits a CLEAR up front, grows the code
width when the just-assigned code reaches the width limit, and resets
at 4096. Encoder/decoder are verified exhaustively self-consistent
(roundtrips across every width-growth boundary, the 4096 reset, and
the cScSc edge); no reference GIF implementation exists in this
container to cross-check stream-level interop against, so that claim
is not made.
"""

from __future__ import annotations

import struct

import numpy as np

_CLEAR = 256
_EOI = 257


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray) -> bytes:
    bw = _BitWriter()
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    bw.write(_CLEAR, width)
    cur = b""
    for v in indices.astype(np.uint8).tobytes():
        cand = cur + bytes([v])
        if cand in table:
            cur = cand
            continue
        bw.write(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096:
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([v])
    if cur:
        bw.write(table[cur], width)
    bw.write(_EOI, width)
    return bw.flush()


def _lzw_decode(data: bytes, n_expected: int) -> np.ndarray:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    ended = False
    while pos < len(data) or nbits >= width:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _EOI:
            ended = True
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # cScSc: code for the entry being built
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond dictionary {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if not ended:
        raise ValueError("LZW: missing end-of-information code")
    if len(out) != n_expected:
        raise ValueError(f"LZW: decoded {len(out)} pixels, expected {n_expected}")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def default_palette() -> np.ndarray:
    """256 x 3 deterministic palette: (i, 2i%256, 3i%256)."""
    i = np.arange(256, dtype=np.int64)
    return np.stack([i % 256, (2 * i) % 256, (3 * i) % 256], axis=1).astype(np.uint8)


def encode_gif(indices: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """indices: HxW uint8 palette indices -> single-frame GIF89a with a
    256-entry global color table."""
    indices = np.asarray(indices, dtype=np.uint8)
    h, w = indices.shape
    pal = default_palette() if palette is None else np.asarray(palette, dtype=np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("palette must be 256x3")
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0) + pal.tobytes()
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(indices.reshape(-1))
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + desc + bytes(blocks) + b"\x3b"


def decode_gif(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """-> (HxW uint8 indices, 256x3 palette). Validates magic, palette
    flags, sub-block framing, trailer and pixel count."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad magic")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    if not flags & 0x80 or (flags & 0x07) != 7:
        raise ValueError("unsupported GIF: need a 256-entry global color table")
    pos = 13
    pal = np.frombuffer(blob, dtype=np.uint8, count=768, offset=pos).reshape(256, 3)
    pos += 768
    while True:
        if pos >= len(blob):
            raise ValueError("truncated GIF: no image descriptor")
        b0 = blob[pos]
        if b0 == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:
            break
        elif b0 == 0x3B:
            raise ValueError("GIF trailer before any image data")
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", blob, pos + 1)
    if iflags & 0xC0:
        raise ValueError("unsupported GIF: local palette / interlace")
    if (iw, ih) != (w, h) or (ix, iy) != (0, 0):
        raise ValueError("unsupported GIF: sub-rectangle frame")
    pos += 10
    if blob[pos] != 8:
        raise ValueError(f"unsupported LZW min code size {blob[pos]}")
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(blob):
            raise ValueError("truncated GIF: unterminated data sub-blocks")
        n = blob[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(blob):
            raise ValueError("truncated GIF data sub-block")
        lzw += blob[pos : pos + n]
        pos += n
    if pos >= len(blob) or blob[pos] != 0x3B:
        raise ValueError("missing GIF trailer")
    idx = _lzw_decode(bytes(lzw), w * h).reshape(h, w)
    return idx, pal.copy()
