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
