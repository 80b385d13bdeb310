#!/usr/bin/env python3
"""Independent zarr v3 array encoder (pure stdlib: struct + gzip + json)
for foreign-file fixtures. Written from the zarr v3.0 spec, deliberately
NOT via graft's Zarr3Store, so vol_zarr3_foreign and Zarr3Spec prove the
reader handles documents/layouts the engine never produced: metadata with
extra attributes, big-endian payloads via the bytes codec, gzip
compression, and optionally the '.' chunk key separator or an absent
(fill-value) chunk.

Voxel values follow the harness volume-grid formula:
    value(z, y, x) = (z//4)*100 + (y//4)*10 + (x//4)

Usage: gen_zarr3_fixture.py OUTDIR [--dim N] [--chunk N] [--endian le|be]
       [--sep /|.] [--drop-chunk] [--codec gzip|none]
"""
import argparse
import gzip
import json
import os
import struct


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=7)
    ap.add_argument("--endian", choices=["le", "be"], default="be")
    ap.add_argument("--sep", choices=["/", "."], default="/")
    ap.add_argument("--drop-chunk", action="store_true")
    ap.add_argument("--codec", choices=["gzip", "none"], default="gzip")
    a = ap.parse_args()

    d, c = a.dim, a.chunk
    nc = (d + c - 1) // c
    codecs = [{"name": "bytes",
               "configuration": {"endian": "little" if a.endian == "le" else "big"}}]
    if a.codec == "gzip":
        codecs.append({"name": "gzip", "configuration": {"level": 6}})
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

    fmt = ("<" if a.endian == "le" else ">") + "H"

    def val(z, y, x):
        if z >= d or y >= d or x >= d:
            return 0  # edge padding inside the chunk
        return (z // 4) * 100 + (y // 4) * 10 + (x // 4)

    for cz in range(nc):
        for cy in range(nc):
            for cx in range(nc):
                if a.drop_chunk and (cz, cy, cx) == (0, 0, 0):
                    continue  # absent chunk -> readers must see fill_value
                payload = b"".join(
                    struct.pack(fmt, val(cz * c + z, cy * c + y, cx * c + x))
                    for z in range(c) for y in range(c) for x in range(c))
                if a.codec == "gzip":
                    payload = gzip.compress(payload, 6)
                key = a.sep.join(["c", str(cz), str(cy), str(cx)])
                path = os.path.join(a.out, *key.split("/"))
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as f:
                    f.write(payload)


if __name__ == "__main__":
    main()
