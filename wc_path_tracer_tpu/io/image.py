"""Image IO: PNG/NumPy dump of render output.

The reference displays through an ImGui viewport texture; headless on TPU the
equivalent capability is saving the accumulation buffer to disk.
"""

from __future__ import annotations

import numpy as np


def write_png(path: str, img_u8: np.ndarray) -> None:
    img_u8 = np.ascontiguousarray(img_u8)
    if img_u8.dtype != np.uint8:
        raise ValueError("write_png expects uint8 HxWx3")
    try:
        from PIL import Image
        Image.fromarray(img_u8, "RGB").save(path)
    except ImportError:  # minimal fallback writer
        import struct
        import zlib

        h, w, _ = img_u8.shape
        raw = b"".join(b"\x00" + img_u8[r].tobytes() for r in range(h))

        def chunk(tag, data):
            c = struct.pack(">I", len(data)) + tag + data
            return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

        with open(path, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n")
            f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
            f.write(chunk(b"IDAT", zlib.compress(raw)))
            f.write(chunk(b"IEND", b""))


def write_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img))


def read_png(path: str) -> np.ndarray:
    """Read an RGB8 PNG back as (H, W, 3) uint8 (PIL, or the minimal
    decoder matching write_png's fallback encoder)."""
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    except ImportError:
        import struct
        import zlib

        with open(path, "rb") as f:
            data = f.read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
        pos, w = 8, None
        idat = b""
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            body = data[pos + 8:pos + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
                if depth != 8 or ctype != 2:
                    raise ValueError("fallback reader handles RGB8 only")
            elif tag == b"IDAT":
                idat += body
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = w * 3 + 1
        rows = []
        prev = np.zeros(w * 3, np.uint8)
        for r in range(h):
            line = raw[r * stride:(r + 1) * stride]
            filt, px = line[0], np.frombuffer(line[1:], np.uint8).copy()
            if filt == 0:
                pass
            elif filt == 2:   # Up
                px = (px.astype(np.uint16) + prev).astype(np.uint8)
            else:
                raise ValueError(f"fallback reader: unsupported filter {filt}")
            rows.append(px)
            prev = px
        return np.stack(rows).reshape(h, w, 3)
