#!/usr/bin/env python3
"""Independent AVI fixture encoder (pure stdlib struct packing — NOT a
port of Multimodal.encodeAviRgb24): writes an uncompressed 24-bit DIB
AVI with the structural quirks real files carry — a JUNK alignment
chunk, an idx1 index, and odd-size padding — so the Scala parser's
chunk walking is proven against a foreign layout, same discipline as
gen_tiff_fixture.py / gen_zarr_group_fixture.py.

Usage: gen_avi_fixture.py OUT.avi WIDTH HEIGHT NFRAMES FPS
Frame bytes follow v = (7*f + 3*i) % 251 over top-down BGR byte index i.
"""
import struct
import sys


def chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def lst(kind: bytes, body: bytes) -> bytes:
    return chunk(b"LIST", kind + body)


def main() -> int:
    out, w, h, nframes, fps = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]))
    row = w * 3
    stride = (row + 3) & ~3
    frame_size = stride * h

    def frame(f: int) -> bytes:
        # bottom-up padded DIB rows of the top-down formula bytes
        rows = []
        for y in range(h - 1, -1, -1):
            data = bytes((7 * f + 3 * (y * row + i)) % 251 for i in range(row))
            rows.append(data + b"\x00" * (stride - row))
        return b"".join(rows)

    avih = struct.pack(
        "<14I", 1000000 // fps, frame_size * fps, 0, 0x10, nframes, 0, 1,
        frame_size, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIiI4H", 0, 0, 0, 0, 1, fps, 0, nframes, frame_size, -1, 0,
        0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    junk = chunk(b"JUNK", b"\x07" * 13)  # odd size → parser must pad
    movi_frames = [chunk(b"00db", frame(f)) for f in range(nframes)]
    movi = lst(b"movi", b"".join(movi_frames))
    # idx1: one entry per frame (flags=0x10 keyframe), offsets relative to movi
    idx_entries = []
    off = 4
    for f in range(nframes):
        idx_entries.append(b"00db" + struct.pack("<III", 0x10, off, frame_size))
        off += 8 + frame_size + (frame_size % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + junk + movi + idx1
    with open(out, "wb") as fobj:
        fobj.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return 0


if __name__ == "__main__":
    sys.exit(main())
