#!/usr/bin/env python3
"""Independent NRRD encoder (pure stdlib: struct + gzip) for foreign-file
fixtures. Written from the NRRD format spec (teem.sourceforge.net/nrrd/
format.html), deliberately NOT via graft's own NrrdStore writer, so
vol_nrrd_foreign and NrrdSpec prove graft.volume.NrrdStore reads files
the engine never produced: NRRD0004 magic, comment lines, key:=value
pairs, ignored fields (space directions / kinds / space origin), CRLF
line endings, big-endian payloads, and gzip encoding.

Voxel values follow the harness volume-grid formula so DuckDB can oracle
the decoded voxels analytically:
    value(z, y, x) = (z//4)*100 + (y//4)*10 + (x//4)

Usage: gen_nrrd_fixture.py OUT.nrrd [--dim N] [--endian le|be]
       [--bits 8|16|32] [--encoding raw|gzip] [--crlf]
"""
import argparse
import gzip
import struct


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--endian", choices=["le", "be"], default="be")
    ap.add_argument("--bits", type=int, choices=[8, 16, 32], default=16)
    ap.add_argument("--encoding", choices=["raw", "gzip"], default="gzip")
    ap.add_argument("--crlf", action="store_true")
    a = ap.parse_args()

    d = a.dim
    fmt = ("<" if a.endian == "le" else ">") + {8: "B", 16: "H", 32: "I"}[a.bits]
    mask = (1 << a.bits) - 1
    payload = b"".join(
        struct.pack(fmt, (((z // 4) * 100 + (y // 4) * 10 + (x // 4)) & mask))
        for z in range(d) for y in range(d) for x in range(d))
    if a.encoding == "gzip":
        payload = gzip.compress(payload, 6)

    nl = "\r\n" if a.crlf else "\n"
    tname = {8: "uint8", 16: "uint16", 32: "uint32"}[a.bits]
    lines = [
        "NRRD0004",
        "# foreign fixture written by gen_nrrd_fixture.py",
        "# (independent pure-stdlib encoder, not graft's writer)",
        f"type: {tname}",
        "dimension: 3",
        "space: left-posterior-superior",
        f"sizes: {d} {d} {d}",
        "space directions: (1,0,0) (0,1,0) (0,0,1)",
        "kinds: domain domain domain",
        f"endian: {'little' if a.endian == 'le' else 'big'}",
        f"encoding: {a.encoding}",
        "space origin: (0,0,0)",
        "graft test key:=some ignored value",
        "",  # blank line terminating the header: join() yields "...\n\n"
        "",
    ]
    with open(a.out, "wb") as f:
        f.write(nl.join(lines).encode("ascii"))
        f.write(payload)


if __name__ == "__main__":
    main()
