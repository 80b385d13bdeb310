#!/usr/bin/env python3
"""Independent OME-NGFF 0.5 (zarr v3) multiscales group encoder (pure
stdlib), deliberately NOT via graft's PyramidWriter/Zarr3Store: a v3
GROUP document with multiscales under attributes.ome (version at the ome
level, per NGFF 0.5), and two pyramid levels as v3 arrays written with
gzip + big-endian payloads. Level 0 follows the harness grid formula
    value(z, y, x) = (z//4)*100 + (y//4)*10 + (x//4)
and level 1 is its stride-2 decimation (value at (2z, 2y, 2x)).

Usage: gen_ngff3_fixture.py OUTDIR [--dim N] [--chunk N]
"""
import argparse
import gzip
import json
import os
import struct


def write_level(out, d, c, val):
    nc = (d + c - 1) // c
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [d, d, d],
        "data_type": "uint16",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [c, c, c]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": 0,
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "big"}},
            {"name": "gzip", "configuration": {"level": 6}},
        ],
        "attributes": {},
    }
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "zarr.json"), "w") as f:
        json.dump(meta, f, indent=1)
    for cz in range(nc):
        for cy in range(nc):
            for cx in range(nc):
                payload = b"".join(
                    struct.pack(
                        ">H",
                        val(cz * c + z, cy * c + y, cx * c + x)
                        if cz * c + z < d and cy * c + y < d and cx * c + x < d else 0)
                    for z in range(c) for y in range(c) for x in range(c))
                path = os.path.join(out, "c", str(cz), str(cy), str(cx))
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as f:
                    f.write(gzip.compress(payload, 6))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=7)
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
    write_level(os.path.join(a.out, "0"), a.dim, a.chunk, v0)
    write_level(os.path.join(a.out, "1"), d1, min(a.chunk, d1),
                lambda z, y, x: v0(2 * z, 2 * y, 2 * x))


if __name__ == "__main__":
    main()
