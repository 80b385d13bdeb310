#!/usr/bin/env python3
"""Independent classic-TIFF encoder (pure stdlib: struct + zlib) for
foreign-file fixtures. Written from the TIFF 6.0 spec, deliberately NOT
via graft's own BigTiff writer, so vol_tiff_foreign_roundtrip and
TiffForeignSpec prove graft.volume.Tiff reads files the engine never
produced: classic magic-42 headers, either byte order, multi-strip pages,
optional deflate compression, 8/16/32-bit grayscale.

Pixel values follow the harness volume-grid formula so DuckDB can oracle
the decoded voxels analytically:
    value(z, y, x) = (z//4)*100 + (y//4)*10 + (x//4)

Usage: gen_tiff_fixture.py OUT.tif [--endian le|be] [--bits 8|16|32]
       [--dim N] [--rps N] [--compress 0|1] [--signed]
"""
import argparse
import struct
import zlib


def grid_slice(z, dim, bits, endian, signed):
    fmt = {8: "b" if signed else "B", 16: "h" if signed else "H",
           32: "i" if signed else "I"}[bits]

    def clamp(v):
        # wrap into the dtype's range (only matters for 8-bit, where the
        # grid formula's max of 333 overflows); readers check the same
        # wrapped formula
        v &= (1 << bits) - 1
        if signed and v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    vals = [clamp((z // 4) * 100 + (y // 4) * 10 + (x // 4))
            for y in range(dim) for x in range(dim)]
    return struct.pack(endian + fmt * len(vals), *vals)


def bigtiff_bytes(slices, w, h, bpp, sample_format, endian, rows_per_strip, compress):
    """BigTIFF (magic 43): 8-byte offsets, 20-byte IFD entries, LONG8
    strip tables — the independent twin of the classic writer below, so
    the reader's BigTIFF branch is also exercised on foreign output."""
    e = endian
    out = bytearray()
    out += b"II" if e == "<" else b"MM"
    out += struct.pack(e + "HHH", 43, 8, 0)
    out += struct.pack(e + "Q", 0)  # first-IFD offset, patched below
    page_strips = []
    for s in slices:
        strips = []
        r = 0
        while r < h:
            n = min(rows_per_strip, h - r)
            chunk = bytes(s[r * w * bpp:(r + n) * w * bpp])
            if compress:
                chunk = zlib.compress(chunk, 6)
            strips.append((len(out), len(chunk)))
            out += chunk
            r += n
        page_strips.append(strips)
    prev_next_pos = 8
    for strips in page_strips:
        nstrips = len(strips)
        if nstrips > 1:  # out-of-line LONG8 arrays precede the IFD
            so_off = len(out)
            for o, _ in strips:
                out += struct.pack(e + "Q", o)
            sc_off = len(out)
            for _, c in strips:
                out += struct.pack(e + "Q", c)
        ifd_off = len(out)
        struct.pack_into(e + "Q", out, prev_next_pos, ifd_off)
        entries = []

        def ent(tag, typ, count, payload):
            entries.append(struct.pack(e + "HHQ", tag, typ, count)
                           + payload + b"\x00" * (8 - len(payload)))

        def short(v):
            return struct.pack(e + "H", v)

        def long8(v):
            return struct.pack(e + "Q", v)

        ent(256, 4, 1, struct.pack(e + "I", w))
        ent(257, 4, 1, struct.pack(e + "I", h))
        ent(258, 3, 1, short(bpp * 8))
        ent(259, 3, 1, short(8 if compress else 1))
        ent(262, 3, 1, short(1))
        if nstrips == 1:
            ent(273, 16, 1, long8(strips[0][0]))
            ent(279, 16, 1, long8(strips[0][1]))
        else:
            ent(273, 16, nstrips, long8(so_off))
            ent(279, 16, nstrips, long8(sc_off))
        ent(277, 3, 1, short(1))
        ent(278, 4, 1, struct.pack(e + "I", rows_per_strip))
        ent(339, 3, 1, short(sample_format))
        entries.sort(key=lambda b: struct.unpack(e + "H", b[:2])[0])
        out += struct.pack(e + "Q", len(entries))
        for x in entries:
            out += x
        prev_next_pos = len(out)
        out += struct.pack(e + "Q", 0)
    return bytes(out)


def tiff_bytes(slices, w, h, bpp, sample_format, endian, rows_per_strip, compress,
               ancillary=False):
    e = endian
    out = bytearray()
    out += b"II" if e == "<" else b"MM"
    out += struct.pack(e + "H", 42)
    out += struct.pack(e + "I", 0)  # first-IFD offset, patched below
    page_strips = []
    for s in slices:
        strips = []
        r = 0
        while r < h:
            n = min(rows_per_strip, h - r)
            chunk = bytes(s[r * w * bpp:(r + n) * w * bpp])
            if compress:
                chunk = zlib.compress(chunk, 6)
            strips.append((len(out), len(chunk)))
            out += chunk
            r += n
        page_strips.append(strips)
    prev_next_pos = 4  # header's first-IFD pointer
    for strips in page_strips:
        nstrips = len(strips)
        if nstrips > 1:  # out-of-line LONG arrays precede the IFD
            so_off = len(out)
            for o, _ in strips:
                out += struct.pack(e + "I", o)
            sc_off = len(out)
            for _, c in strips:
                out += struct.pack(e + "I", c)
        if ancillary:
            # the tags real writers add that a reader must SKIP, not
            # choke on: RATIONAL resolutions + a nul-terminated ASCII
            # Software string, both out-of-line
            xres_off = len(out)
            out += struct.pack(e + "II", 72, 1)
            soft = b"gen_tiff_fixture.py\x00"
            soft_off = len(out)
            out += soft
        ifd_off = len(out)
        struct.pack_into(e + "I", out, prev_next_pos, ifd_off)
        entries = []

        def ent(tag, typ, count, payload):
            # inline values are left-justified in the 4-byte field
            entries.append(struct.pack(e + "HHI", tag, typ, count)
                           + payload + b"\x00" * (4 - len(payload)))

        def short(v):
            return struct.pack(e + "H", v)

        def long_(v):
            return struct.pack(e + "I", v)

        ent(256, 4, 1, long_(w))
        ent(257, 4, 1, long_(h))
        ent(258, 3, 1, short(bpp * 8))
        ent(259, 3, 1, short(8 if compress else 1))
        ent(262, 3, 1, short(1))  # BlackIsZero
        if nstrips == 1:
            ent(273, 4, 1, long_(strips[0][0]))
            ent(279, 4, 1, long_(strips[0][1]))
        else:
            ent(273, 4, nstrips, long_(so_off))
            ent(279, 4, nstrips, long_(sc_off))
        ent(277, 3, 1, short(1))
        ent(278, 4, 1, long_(rows_per_strip))
        ent(339, 3, 1, short(sample_format))
        if ancillary:
            ent(282, 5, 1, long_(xres_off))          # XResolution RATIONAL
            ent(283, 5, 1, long_(xres_off))          # YResolution RATIONAL
            ent(296, 3, 1, short(2))                 # ResolutionUnit inch
            ent(305, 2, len(soft), long_(soft_off))  # Software ASCII
        entries.sort(key=lambda b: struct.unpack(e + "H", b[:2])[0])
        out += struct.pack(e + "H", len(entries))
        for x in entries:
            out += x
        prev_next_pos = len(out)
        out += struct.pack(e + "I", 0)
    return bytes(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--endian", choices=["le", "be"], default="le")
    ap.add_argument("--bits", type=int, choices=[8, 16, 32], default=16)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--rps", type=int, default=5)
    ap.add_argument("--compress", type=int, choices=[0, 1], default=1)
    ap.add_argument("--signed", action="store_true")
    ap.add_argument("--ancillary", action="store_true",
                    help="add XResolution/YResolution RATIONALs + Software ASCII")
    ap.add_argument("--bigtiff", action="store_true",
                    help="write BigTIFF (magic 43, 8-byte offsets) instead of classic")
    a = ap.parse_args()
    e = "<" if a.endian == "le" else ">"
    slices = [grid_slice(z, a.dim, a.bits, e, a.signed) for z in range(a.dim)]
    if a.bigtiff:
        data = bigtiff_bytes(slices, a.dim, a.dim, a.bits // 8,
                             2 if a.signed else 1, e, a.rps, a.compress)
    else:
        data = tiff_bytes(slices, a.dim, a.dim, a.bits // 8,
                          2 if a.signed else 1, e, a.rps, a.compress,
                          ancillary=a.ancillary)
    with open(a.out, "wb") as f:
        f.write(data)
    print(f"wrote {a.out}: {'bigtiff' if a.bigtiff else 'classic'} {a.dim}^3 "
          f"{'' if a.signed else 'u'}int{a.bits} "
          f"{a.endian} rps={a.rps} compress={a.compress} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
