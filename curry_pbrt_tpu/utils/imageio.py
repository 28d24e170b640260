"""Host-side image IO: PNG (via PIL) and a minimal EXR reader.

Mirrors the reference's readers (/root/reference/src/texture/image/png.rs:
8-bit RGB → float in [0,1]; image/exr.rs: R/G/B channels, F16/F32/U32) and
the PNG writer with gamma + 0.5 rounding (texture/image.rs:108-127).
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np


def read_image(path) -> np.ndarray:
    """→ (H, W, 3) f32 linear-file values (no gamma applied here; the
    texture map applies inverse gamma for spectrum textures, matching
    scene/texture_map.rs:42-46)."""
    path = Path(path)
    ext = path.suffix.lower()
    if ext == ".png" or ext in (".jpg", ".jpeg", ".bmp", ".tga"):
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img, dtype=np.float32) / 255.0
    if ext == ".exr":
        return read_exr(path)
    raise ValueError(f"unsupported image extension {ext!r}")


def write_png(path, rgb_u8: np.ndarray) -> None:
    """rgb_u8: (H, W, 3) uint8."""
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.asarray(rgb_u8, dtype=np.uint8), mode="RGB").save(str(path))


# ---------------------------------------------------------------------------
# minimal EXR reader: single-part scanline files, NONE/ZIP/ZIPS compression,
# HALF/FLOAT/UINT channels — the subset the reference's exr crate usage needs.

_PIXTYPE_SIZES = {0: 4, 1: 2, 2: 4}  # UINT, HALF, FLOAT


def _read_cstr(buf, off):
    end = buf.index(b"\0", off)
    return buf[off:end].decode("latin-1"), end + 1


def read_exr(path) -> np.ndarray:
    buf = Path(path).read_bytes()
    if buf[:4] != b"\x76\x2f\x31\x01":
        raise ValueError("not an EXR file")
    version = struct.unpack("<I", buf[4:8])[0]
    if version & 0x200:
        raise ValueError("tiled/deep EXR not supported")
    off = 8
    attrs = {}
    while True:
        if buf[off] == 0:
            off += 1
            break
        name, off = _read_cstr(buf, off)
        atype, off = _read_cstr(buf, off)
        size = struct.unpack("<I", buf[off : off + 4])[0]
        off += 4
        attrs[name] = (atype, buf[off : off + size])
        off += size

    # channels
    chans = []
    cbuf = attrs["channels"][1]
    coff = 0
    while cbuf[coff] != 0:
        cname, coff = _read_cstr(cbuf, coff)
        ptype, _plin, _resx, _resy = struct.unpack("<IIII", cbuf[coff : coff + 16])
        coff += 16
        chans.append((cname, ptype))
    chans_sorted = sorted(chans)  # EXR stores channels alphabetically per scanline

    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    width, height = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    if comp not in (0, 2, 3):  # NONE, ZIPS, ZIP
        raise ValueError(f"unsupported EXR compression {comp}")
    lines_per_block = 1 if comp in (0, 2) else 16

    n_blocks = (height + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack("<%dQ" % n_blocks, buf[off : off + 8 * n_blocks])

    out = {c: np.zeros((height, width), np.float32) for c, _ in chans}
    bytes_per_line = sum(_PIXTYPE_SIZES[t] for _, t in chans) * width
    for bo in offsets:
        y = struct.unpack("<i", buf[bo : bo + 4])[0] - y0
        dsize = struct.unpack("<I", buf[bo + 4 : bo + 8])[0]
        data = buf[bo + 8 : bo + 8 + dsize]
        n_lines = min(lines_per_block, height - y)
        raw_size = bytes_per_line * n_lines
        if comp != 0 and dsize < raw_size:
            data = zlib.decompress(data)
            # EXR zip predictor: delta-decode then de-interleave
            d = bytearray(data)
            for i in range(1, len(d)):
                d[i] = (d[i] + d[i - 1] - 128) & 0xFF
            half = (len(d) + 1) // 2
            inter = bytearray(len(d))
            inter[0::2] = d[:half]
            inter[1::2] = d[half : half + len(d) - half]
            data = bytes(inter)
        pos = 0
        for line in range(n_lines):
            for cname, ptype in chans_sorted:
                sz = _PIXTYPE_SIZES[ptype] * width
                seg = data[pos : pos + sz]
                pos += sz
                if ptype == 1:
                    vals = np.frombuffer(seg, dtype=np.float16).astype(np.float32)
                elif ptype == 2:
                    vals = np.frombuffer(seg, dtype="<f4").astype(np.float32)
                else:
                    vals = np.frombuffer(seg, dtype="<u4").astype(np.float32)
                out[cname][y + line] = vals

    rgb = np.zeros((height, width, 3), np.float32)
    for i, c in enumerate("RGB"):
        if c in out:
            rgb[..., i] = out[c]
        elif "Y" in out:
            rgb[..., i] = out["Y"]
    return rgb
