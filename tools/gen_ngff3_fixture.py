#!/usr/bin/env python3
"""Independent OME-NGFF 0.5 (zarr v3) multiscales group encoder (pure
stdlib), deliberately NOT via graft's PyramidWriter/Zarr3Store: a v3
GROUP document with multiscales under attributes.ome (version at the ome
level, per NGFF 0.5), and two pyramid levels as v3 arrays written with
gzip + big-endian payloads. Level 0 follows the harness grid formula
    value(z, y, x) = (z//4)*100 + (y//4)*10 + (x//4)
and level 1 is its stride-2 decimation (value at (2z, 2y, 2x)).

With --shard-inner N, levels are written as SHARDING_INDEXED arrays
instead (the chunk becomes the shard shape, inner chunks of N, gzip'd
per inner chunk, crc32c'd uint64-LE index at the end of each shard) —
the at-scale NGFF layout, encoded here independently of graft.

Usage: gen_ngff3_fixture.py OUTDIR [--dim N] [--chunk N] [--shard-inner N]
"""
import argparse
import gzip
import json
import os
import struct

# CRC-32C (Castagnoli), reflected — same table construction as
# gen_zarr3_fixture.py (kept self-contained: fixture tools are
# standalone encoders).
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def write_level(out, d, c, val, shard_inner=0):
    nc = (d + c - 1) // c
    inner_codecs = [
        {"name": "bytes", "configuration": {"endian": "big"}},
        {"name": "gzip", "configuration": {"level": 6}},
    ]
    if shard_inner:
        assert c % shard_inner == 0
        codecs = [{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": [shard_inner] * 3,
                "codecs": inner_codecs,
                "index_codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}},
                    {"name": "crc32c"},
                ],
                "index_location": "end",
            },
        }]
    else:
        codecs = inner_codecs
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [d, d, d],
        "data_type": "uint16",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [c, c, c]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": 0,
        "codecs": codecs,
        "attributes": {},
    }
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "zarr.json"), "w") as f:
        json.dump(meta, f, indent=1)

    def block(z0, y0, x0, edge):
        return gzip.compress(b"".join(
            struct.pack(">H",
                        val(z0 + z, y0 + y, x0 + x)
                        if z0 + z < d and y0 + y < d and x0 + x < d else 0)
            for z in range(edge) for y in range(edge) for x in range(edge)), 6)

    for cz in range(nc):
        for cy in range(nc):
            for cx in range(nc):
                if not shard_inner:
                    body = block(cz * c, cy * c, cx * c, c)
                else:
                    n_in = c // shard_inner
                    entries, data, off = [], b"", 0
                    for lz in range(n_in):
                        for ly in range(n_in):
                            for lx in range(n_in):
                                z0 = cz * c + lz * shard_inner
                                y0 = cy * c + ly * shard_inner
                                x0 = cx * c + lx * shard_inner
                                if z0 >= d or y0 >= d or x0 >= d:
                                    entries.append((2 ** 64 - 1, 2 ** 64 - 1))
                                else:
                                    blob = block(z0, y0, x0, shard_inner)
                                    entries.append((off, len(blob)))
                                    data += blob
                                    off += len(blob)
                    index = b"".join(struct.pack("<QQ", o, n) for o, n in entries)
                    index += struct.pack("<I", crc32c(index))
                    body = data + index
                path = os.path.join(out, "c", str(cz), str(cy), str(cx))
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as f:
                    f.write(body)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=7)
    ap.add_argument("--shard-inner", type=int, default=0)
    a = ap.parse_args()

    def v0(z, y, x):
        return (z // 4) * 100 + (y // 4) * 10 + (x // 4)

    group = {
        "zarr_format": 3,
        "node_type": "group",
        "attributes": {
            "ome": {
                "version": "0.5",
                "multiscales": [{
                    "name": "foreign-labels",
                    "axes": [
                        {"name": "z", "type": "space", "unit": "micrometer"},
                        {"name": "y", "type": "space", "unit": "micrometer"},
                        {"name": "x", "type": "space", "unit": "micrometer"},
                    ],
                    "datasets": [
                        {"path": "0", "coordinateTransformations":
                            [{"type": "scale", "scale": [1.0, 1.0, 1.0]}]},
                        {"path": "1", "coordinateTransformations":
                            [{"type": "scale", "scale": [2.0, 2.0, 2.0]}]},
                    ],
                }],
            },
        },
    }
    os.makedirs(a.out, exist_ok=True)
    with open(os.path.join(a.out, "zarr.json"), "w") as f:
        json.dump(group, f, indent=1)
    d1 = (a.dim + 1) // 2
    c1 = min(a.chunk, d1)
    if a.shard_inner:
        assert c1 % a.shard_inner == 0, "level-1 chunk must stay divisible"
    write_level(os.path.join(a.out, "0"), a.dim, a.chunk, v0, a.shard_inner)
    write_level(os.path.join(a.out, "1"), d1, c1,
                lambda z, y, x: v0(2 * z, 2 * y, 2 * x), a.shard_inner)


if __name__ == "__main__":
    main()
