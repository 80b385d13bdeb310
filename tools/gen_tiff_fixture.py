#!/usr/bin/env python3
"""Independent classic-TIFF encoder (pure stdlib: struct + zlib) for
foreign-file fixtures. Written from the TIFF 6.0 spec, deliberately NOT
via graft's own BigTiff writer, so vol_tiff_*_roundtrip and
TiffForeignSpec prove graft.volume.Tiff reads files the engine never
produced: classic magic-42 headers, either byte order, multi-strip or
TILED pages, none/deflate/LZW/PackBits compression, optional horizontal
predictor, 8/16/32-bit grayscale.

Pixel values follow the harness volume-grid formula so DuckDB can oracle
the decoded voxels analytically:
    value(z, y, x) = (z//4)*100 + (y//4)*10 + (x//4)

Usage: gen_tiff_fixture.py OUT.tif [--endian le|be] [--bits 8|16|32]
       [--dim N] [--rps N] [--compress 0|1|none|deflate|lzw|packbits]
       [--signed] [--predictor 1|2] [--tiled] [--tile N]
"""
import argparse
import struct
import zlib

COMP_NONE, COMP_LZW, COMP_DEFLATE, COMP_PACKBITS = 1, 5, 8, 32773


def grid_slice(z, dim_y, dim_x, bits, endian, signed, noise=False):
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

    def val(y, x):
        if noise:
            # deterministic high-entropy values (LCG mix of the flat
            # index): exercises the literal-heavy / stored-stream codec
            # paths the low-entropy grid never reaches. Readers recompute
            # the same 64-bit-wrapped formula.
            i = (z * dim_y + y) * dim_x + x
            h = (i * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
            return h >> 17
        return (z // 4) * 100 + (y // 4) * 10 + (x // 4)

    vals = [clamp(val(y, x)) for y in range(dim_y) for x in range(dim_x)]
    return struct.pack(endian + fmt * len(vals), *vals)


def lzw_encode(data):
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, ClearCode
    256 / EOI 257, first table entry 258, 9->12 bit codes with the spec's
    early width change (code width bumps once code 511/1023/2047 has been
    ADDED, so the decoder switches in lockstep after storing #510/#1022/
    #2046)."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh_table():
        return {bytes([i]): i for i in range(256)}

    emit(256)  # leading Clear, as the spec's encoder pseudo-code does
    table = fresh_table()
    next_code = 258
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1  # the code just added was 511/1023/2047
        if next_code >= 4094:  # keep clear of the 12-bit ceiling
            emit(256)
            table = fresh_table()
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(257)  # EOI
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_encode_row(row):
    """PackBits (TIFF 6.0 §9) one row: literal runs (n>=0: n+1 bytes) and
    repeat runs (n in -1..-127: next byte 1-n times)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find a repeat run of >= 2
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # repeat run row[i..j]
            out.append(256 - (j - i))  # -(run-1) as unsigned byte
            out.append(row[i])
            i = j + 1
            continue
        # literal run until the next 3-byte repeat (2-byte repeats are
        # cheaper left inside the literal) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def hdiff(chunk, row_samples, bpp, endian):
    """Horizontal differencing (Predictor=2): per row, each sample becomes
    its delta from the left neighbor, wrapping mod 2^bits. Operates
    unsigned — the byte stream is identical for signed data."""
    fmt = {1: "B", 2: "H", 4: "I"}[bpp]
    mask = (1 << (bpp * 8)) - 1
    out = bytearray()
    row_bytes = row_samples * bpp
    for r in range(0, len(chunk), row_bytes):
        vals = list(struct.unpack(endian + fmt * row_samples,
                                  chunk[r:r + row_bytes]))
        diffed = [vals[0]] + [(vals[i] - vals[i - 1]) & mask
                              for i in range(1, row_samples)]
        out += struct.pack(endian + fmt * row_samples, *diffed)
    return bytes(out)


def encode_chunk(chunk, compress, row_samples, bpp, endian, predictor):
    if predictor == 2:
        chunk = hdiff(chunk, row_samples, bpp, endian)
    if compress == COMP_DEFLATE:
        return zlib.compress(chunk, 6)
    if compress == COMP_LZW:
        return lzw_encode(chunk)
    if compress == COMP_PACKBITS:
        row_bytes = row_samples * bpp
        return b"".join(packbits_encode_row(chunk[r:r + row_bytes])
                        for r in range(0, len(chunk), row_bytes))
    return chunk


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
            chunk = encode_chunk(bytes(s[r * w * bpp:(r + n) * w * bpp]),
                                 compress, w, bpp, e, 1)
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
        ent(259, 3, 1, short(compress))
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


def tile_chunks(s, w, h, bpp, tile):
    """Cut one slice into left-to-right, top-to-bottom tiles, edge tiles
    zero-padded to the full tile size as TIFF 6.0 §15 requires."""
    chunks = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            t = bytearray(tile * tile * bpp)
            for r in range(min(tile, h - ty)):
                src = ((ty + r) * w + tx) * bpp
                ncols = min(tile, w - tx)
                t[r * tile * bpp:r * tile * bpp + ncols * bpp] = \
                    s[src:src + ncols * bpp]
            chunks.append(bytes(t))
    return chunks


def tiff_bytes(slices, w, h, bpp, sample_format, endian, rows_per_strip, compress,
               ancillary=False, tile=0, predictor=1):
    e = endian
    out = bytearray()
    out += b"II" if e == "<" else b"MM"
    out += struct.pack(e + "H", 42)
    out += struct.pack(e + "I", 0)  # first-IFD offset, patched below
    page_strips = []
    for s in slices:
        strips = []
        if tile:
            for t in tile_chunks(s, w, h, bpp, tile):
                chunk = encode_chunk(t, compress, tile, bpp, e, predictor)
                strips.append((len(out), len(chunk)))
                out += chunk
        else:
            r = 0
            while r < h:
                n = min(rows_per_strip, h - r)
                chunk = encode_chunk(bytes(s[r * w * bpp:(r + n) * w * bpp]),
                                     compress, w, bpp, e, predictor)
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
        ent(259, 3, 1, short(compress))
        ent(262, 3, 1, short(1))  # BlackIsZero
        off_tag, cnt_tag = (324, 325) if tile else (273, 279)
        if nstrips == 1:
            ent(off_tag, 4, 1, long_(strips[0][0]))
            ent(cnt_tag, 4, 1, long_(strips[0][1]))
        else:
            ent(off_tag, 4, nstrips, long_(so_off))
            ent(cnt_tag, 4, nstrips, long_(sc_off))
        ent(277, 3, 1, short(1))
        if tile:
            ent(322, 4, 1, long_(tile))
            ent(323, 4, 1, long_(tile))
        else:
            ent(278, 4, 1, long_(rows_per_strip))
        if predictor != 1:
            ent(317, 3, 1, short(predictor))
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
    ap.add_argument("--compress",
                    choices=["0", "1", "none", "deflate", "lzw", "packbits"],
                    default="1",
                    help="0/none, 1/deflate (back-compat numerals), lzw, packbits")
    ap.add_argument("--signed", action="store_true")
    ap.add_argument("--predictor", type=int, choices=[1, 2], default=1,
                    help="2 = horizontal differencing before compression")
    ap.add_argument("--tiled", action="store_true",
                    help="tile layout (tags 322-325) instead of strips")
    ap.add_argument("--tile", type=int, default=16,
                    help="tile edge (TIFF wants multiples of 16)")
    ap.add_argument("--noise", action="store_true",
                    help="deterministic high-entropy pixels instead of the grid")
    ap.add_argument("--ancillary", action="store_true",
                    help="add XResolution/YResolution RATIONALs + Software ASCII")
    ap.add_argument("--bigtiff", action="store_true",
                    help="write BigTIFF (magic 43, 8-byte offsets) instead of classic")
    a = ap.parse_args()
    e = "<" if a.endian == "le" else ">"
    comp = {"0": COMP_NONE, "none": COMP_NONE, "1": COMP_DEFLATE,
            "deflate": COMP_DEFLATE, "lzw": COMP_LZW,
            "packbits": COMP_PACKBITS}[a.compress]
    slices = [grid_slice(z, a.dim, a.dim, a.bits, e, a.signed, noise=a.noise)
              for z in range(a.dim)]
    if a.bigtiff:
        assert comp in (COMP_NONE, COMP_DEFLATE) and not a.tiled and a.predictor == 1, \
            "BigTIFF fixture path covers strips + none/deflate only"
        data = bigtiff_bytes(slices, a.dim, a.dim, a.bits // 8,
                             2 if a.signed else 1, e, a.rps, comp)
    else:
        data = tiff_bytes(slices, a.dim, a.dim, a.bits // 8,
                          2 if a.signed else 1, e, a.rps, comp,
                          ancillary=a.ancillary,
                          tile=a.tile if a.tiled else 0,
                          predictor=a.predictor)
    with open(a.out, "wb") as f:
        f.write(data)
    print(f"wrote {a.out}: {'bigtiff' if a.bigtiff else 'classic'} {a.dim}^3 "
          f"{'' if a.signed else 'u'}int{a.bits} "
          f"{a.endian} rps={a.rps} compress={a.compress} "
          f"tiled={a.tiled} predictor={a.predictor} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
