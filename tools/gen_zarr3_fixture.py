#!/usr/bin/env python3
"""Independent zarr v3 array encoder (pure stdlib: struct + gzip + json)
for foreign-file fixtures. Written from the zarr v3.0 spec, deliberately
NOT via graft's Zarr3Store, so vol_zarr3_foreign and Zarr3Spec prove the
reader handles documents/layouts the engine never produced: metadata with
extra attributes, big-endian payloads via the bytes codec, gzip
compression, and optionally the '.' chunk key separator or an absent
(fill-value) chunk.

With --shard-inner N, writes a SHARDING_INDEXED layout instead: the
chunk_grid chunk_shape becomes the shard shape (--chunk), each shard
file holds an inner grid of independently-gzip'd chunks plus the binary
(offset, nbytes) uint64-LE index with its crc32c (implemented here from
the Castagnoli polynomial, not via graft), at --index-location start or
end. One inner chunk may be dropped (--drop-chunk) to exercise the
missing-cell sentinel.

Voxel values follow the harness volume-grid formula:
    value(z, y, x) = (z//4)*100 + (y//4)*10 + (x//4)

Usage: gen_zarr3_fixture.py OUTDIR [--dim N] [--chunk N] [--endian le|be]
       [--sep /|.] [--drop-chunk] [--codec gzip|none]
       [--shard-inner N] [--index-location start|end]
"""
import argparse
import gzip
import json
import os
import struct

# CRC-32C (Castagnoli), reflected, poly 0x1EDC6F41 -> reflected 0x82F63B78.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=7)
    ap.add_argument("--endian", choices=["le", "be"], default="be")
    ap.add_argument("--sep", choices=["/", "."], default="/")
    ap.add_argument("--drop-chunk", action="store_true")
    ap.add_argument("--codec", choices=["gzip", "none"], default="gzip")
    ap.add_argument("--shard-inner", type=int, default=0,
                    help="inner chunk edge; nonzero selects the sharded layout")
    ap.add_argument("--index-location", choices=["start", "end"], default="end")
    a = ap.parse_args()

    d, c = a.dim, a.chunk
    nc = (d + c - 1) // c
    fmt = ("<" if a.endian == "le" else ">") + "H"

    def val(z, y, x):
        if z >= d or y >= d or x >= d:
            return 0  # edge padding inside the chunk
        return (z // 4) * 100 + (y // 4) * 10 + (x // 4)

    inner_codecs = [{"name": "bytes",
                     "configuration": {"endian": "little" if a.endian == "le" else "big"}}]
    if a.codec == "gzip":
        inner_codecs.append({"name": "gzip", "configuration": {"level": 6}})

    if a.shard_inner:
        ic = a.shard_inner
        assert c % ic == 0, "shard shape must be a multiple of the inner shape"
        codecs = [{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": [ic, ic, ic],
                "codecs": inner_codecs,
                "index_codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}},
                    {"name": "crc32c"},
                ],
                "index_location": a.index_location,
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
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": a.sep}},
        "fill_value": 0,
        "codecs": codecs,
        "attributes": {"written-by": "gen_zarr3_fixture.py", "foreign": True},
    }
    os.makedirs(a.out, exist_ok=True)
    with open(os.path.join(a.out, "zarr.json"), "w") as f:
        json.dump(meta, f, indent=1)

    def encode_block(z0, y0, x0, edge):
        payload = b"".join(
            struct.pack(fmt, val(z0 + z, y0 + y, x0 + x))
            for z in range(edge) for y in range(edge) for x in range(edge))
        if a.codec == "gzip":
            payload = gzip.compress(payload, 6)
        return payload

    def write_key(cz, cy, cx, body):
        key = a.sep.join(["c", str(cz), str(cy), str(cx)])
        path = os.path.join(a.out, *key.split("/"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(body)

    if not a.shard_inner:
        for cz in range(nc):
            for cy in range(nc):
                for cx in range(nc):
                    if a.drop_chunk and (cz, cy, cx) == (0, 0, 0):
                        continue  # absent chunk -> readers must see fill_value
                    write_key(cz, cy, cx, encode_block(cz * c, cy * c, cx * c, c))
        return

    # sharded layout: per shard, inner cells in C-order, index per spec
    ic = a.shard_inner
    n_in = c // ic
    missing = (2 ** 64 - 1, 2 ** 64 - 1)
    for scz in range(nc):
        for scy in range(nc):
            for scx in range(nc):
                blobs, cells = [], []
                for lz in range(n_in):
                    for ly in range(n_in):
                        for lx in range(n_in):
                            z0 = scz * c + lz * ic
                            y0 = scy * c + ly * ic
                            x0 = scx * c + lx * ic
                            out_of_array = z0 >= d or y0 >= d or x0 >= d
                            dropped = a.drop_chunk and (z0, y0, x0) == (0, 0, 0)
                            if out_of_array or dropped:
                                cells.append(None)
                            else:
                                blob = encode_block(z0, y0, x0, ic)
                                cells.append(blob)
                index_len = n_in ** 3 * 16 + 4
                data_base = 0 if a.index_location == "end" else index_len
                entries, body, off = [], b"", data_base
                for blob in cells:
                    if blob is None:
                        entries.append(missing)
                    else:
                        entries.append((off, len(blob)))
                        body += blob
                        off += len(blob)
                index = b"".join(struct.pack("<QQ", o, n) for o, n in entries)
                index += struct.pack("<I", crc32c(index))
                shard = body + index if a.index_location == "end" else index + body
                write_key(scz, scy, scx, shard)


if __name__ == "__main__":
    main()
