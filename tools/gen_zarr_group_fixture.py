#!/usr/bin/env python3
"""Foreign OME-Zarr v2 MULTISCALES GROUP fixture generator.

Writes a 2-level pyramid group with python stdlib only (json + zlib +
struct — no zarr, no numpy, no engine code): level 0 is the D^3 label
grid  label(z,y,x) = (z//4)*100 + (y//4)*10 + (x//4)  as little-endian
uint32, level 1 its stride-2 decimation.  The layout is what
`zarr.open_group` / `zarr.open_consolidated` emit and the reference's
viewer reads via `da.from_zarr` (view_upscaled.py:11):

  --layout plain          .zgroup + .zattrs (multiscales) + 0/ + 1/
  --layout consolidated   .zmetadata ONLY at group level (arrays keep
                          their .zarray) — proves a reader takes the
                          one-GET consolidated path and never needs the
                          loose group files

Chunks are (5,6,7) — deliberately non-aligned so edge chunks are
zero-padded, the padding semantics zarr v2 requires.
"""
import json
import struct
import sys
import zlib
from pathlib import Path

D = 16
CHUNKS = (5, 6, 7)
SPACING = 25.0


def label(z, y, x):
    return (z // 4) * 100 + (y // 4) * 10 + (x // 4)


def level_values(level):
    """Dense C-order values of pyramid level `level` (stride 2**level)."""
    s = 1 << level
    dim = D // s
    vals = []
    for z in range(dim):
        for y in range(dim):
            for x in range(dim):
                vals.append(label(z * s, y * s, x * s))
    return dim, vals


def write_array(dirpath, dim, vals):
    cz, cy, cx = (min(c, dim) for c in CHUNKS)
    dirpath.mkdir(parents=True, exist_ok=True)
    zarray = {
        "zarr_format": 2,
        "shape": [dim, dim, dim],
        "chunks": [cz, cy, cx],
        "dtype": "<u4",
        "compressor": {"id": "zlib", "level": 5},
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    (dirpath / ".zarray").write_text(json.dumps(zarray))
    nc = lambda c: -(-dim // c)
    for iz in range(nc(cz)):
        for iy in range(nc(cy)):
            for ix in range(nc(cx)):
                blk = bytearray(cz * cy * cx * 4)
                for bz in range(min(cz, dim - iz * cz)):
                    for by in range(min(cy, dim - iy * cy)):
                        for bx in range(min(cx, dim - ix * cx)):
                            v = vals[((iz * cz + bz) * dim + iy * cy + by) * dim + ix * cx + bx]
                            off = ((bz * cy + by) * cx + bx) * 4
                            blk[off:off + 4] = struct.pack("<I", v)
                (dirpath / f"{iz}.{iy}.{ix}").write_bytes(zlib.compress(bytes(blk), 5))
    return zarray


def multiscales_attrs(levels):
    return {
        "multiscales": [{
            "version": "0.4",
            "name": "labels",
            "axes": [
                {"name": "z", "type": "space", "unit": "micrometer"},
                {"name": "y", "type": "space", "unit": "micrometer"},
                {"name": "x", "type": "space", "unit": "micrometer"},
            ],
            "datasets": [
                {"path": str(i),
                 "coordinateTransformations": [
                     {"type": "scale",
                      "scale": [SPACING * (1 << i)] * 3}]}
                for i in range(levels)
            ],
        }],
        "image-label": True,
    }


def main():
    args = sys.argv[1:]
    assert args, "usage: gen_zarr_group_fixture.py DEST [--layout plain|consolidated]"
    dest = Path(args[0])
    layout = "plain"
    if "--layout" in args:
        layout = args[args.index("--layout") + 1]
    assert layout in ("plain", "consolidated"), layout
    dest.mkdir(parents=True, exist_ok=True)

    zarrays = {}
    for lvl in (0, 1):
        dim, vals = level_values(lvl)
        zarrays[lvl] = write_array(dest / str(lvl), dim, vals)

    zgroup = {"zarr_format": 2}
    zattrs = multiscales_attrs(2)
    if layout == "plain":
        (dest / ".zgroup").write_text(json.dumps(zgroup))
        (dest / ".zattrs").write_text(json.dumps(zattrs))
    else:
        consolidated = {
            "metadata": {
                ".zgroup": zgroup,
                ".zattrs": zattrs,
                "0/.zarray": zarrays[0],
                "1/.zarray": zarrays[1],
            },
            "zarr_consolidated_format": 1,
        }
        (dest / ".zmetadata").write_text(json.dumps(consolidated))
    print("GROUP_FIXTURE_OK")


if __name__ == "__main__":
    main()
