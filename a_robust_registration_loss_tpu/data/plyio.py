"""PLY mesh reader/writer (ascii and binary_little_endian).

Replaces the reference's plyfile-backed reader (fmr/se_math/mesh.py:13-250,
used for FMR's real-scan ablation inputs). Only the surface the reference
needs: vertex x/y/z properties and triangular face index lists. The
matplotlib plotting half of the reference's Mesh class is visualization-only
and out of scope (SURVEY.md §2.6: open3d/matplotlib viz optional).
"""

from __future__ import annotations

import struct

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply(path: str):
    """Read a PLY file -> (vertices (N, 3) float32, faces (F, 3) int32).

    Supports format ascii 1.0 and binary_little_endian 1.0; extra vertex
    properties are read and discarded; faces beyond triangles are
    fan-triangulated (matching how the reference's pipeline consumes only
    triangle soups)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) | ('list', idx_dt, val_dt, name)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1][2].append((parts[2], parts[1]))
            elif parts[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"{path}: unsupported PLY format {fmt!r}")

        vertices, faces = [], []
        for name, count, props in elements:
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    keys = [p[0] for p in props]
                    ix, iy, iz = keys.index("x"), keys.index("y"), keys.index("z")
                    vertices = [
                        (float(r[ix]), float(r[iy]), float(r[iz])) for r in rows
                    ]
                elif name == "face":
                    for r in rows:
                        n = int(r[0])
                        idx = [int(v) for v in r[1 : 1 + n]]
                        for k in range(1, n - 1):
                            faces.append((idx[0], idx[k], idx[k + 1]))
            else:
                if name == "vertex" and all(p[0] != "list" for p in props):
                    dt = np.dtype(
                        [(p[0], "<" + _PLY_DTYPES[p[1]]) for p in props]
                    )
                    arr = np.frombuffer(f.read(dt.itemsize * count), dt)
                    vertices = np.stack(
                        [arr["x"], arr["y"], arr["z"]], -1
                    ).astype(np.float32)
                else:
                    for _ in range(count):
                        row_vals = []
                        for p in props:
                            if p[0] == "list":
                                idt = np.dtype("<" + _PLY_DTYPES[p[1]])
                                vdt = np.dtype("<" + _PLY_DTYPES[p[2]])
                                n = int(
                                    np.frombuffer(f.read(idt.itemsize), idt)[0]
                                )
                                vals = np.frombuffer(
                                    f.read(vdt.itemsize * n), vdt
                                )
                                row_vals.append(vals)
                            else:
                                pdt = np.dtype("<" + _PLY_DTYPES[p[1]])
                                row_vals.append(
                                    np.frombuffer(f.read(pdt.itemsize), pdt)[0]
                                )
                        if name == "face" and row_vals:
                            idx = [int(v) for v in np.asarray(row_vals[0])]
                            for k in range(1, len(idx) - 1):
                                faces.append((idx[0], idx[k], idx[k + 1]))

    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    fc = np.asarray(faces, np.int32).reshape(-1, 3)
    return v, fc


def write_ply(path: str, vertices, faces=None, binary: bool = False,
              colors=None):
    """Write vertices (N, 3) (+ optional triangle faces) as PLY.

    ``colors``: optional (3,) uniform or (N, 3) per-vertex colors, floats in
    [0, 1] or uint8 — the paint_uniform_color role of the reference's open3d
    eval visualization (fmr/evaluate_fmr.py:34-43)."""
    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    fc = None if faces is None else np.asarray(faces, np.int32).reshape(-1, 3)
    col = None
    if colors is not None:
        col = np.asarray(colors)
        if np.issubdtype(col.dtype, np.integer):
            # any integer dtype means 0-255 channel values (not just uint8)
            col = np.clip(col, 0, 255).astype(np.uint8)
        else:
            # float dtypes mean [0, 1] channel values
            col = (np.clip(col, 0.0, 1.0) * 255).astype(np.uint8)
        col = np.broadcast_to(col.reshape(-1, 3), (len(v), 3))
    fmt = "binary_little_endian" if binary else "ascii"
    header = ["ply", f"format {fmt} 1.0", f"element vertex {len(v)}",
              "property float x", "property float y", "property float z"]
    if col is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    if fc is not None:
        header += [f"element face {len(fc)}",
                   "property list uchar int vertex_indices"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            if col is None:
                f.write(v.astype("<f4").tobytes())
            else:
                dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                               ("red", "u1"), ("green", "u1"), ("blue", "u1")])
                rec = np.empty(len(v), dt)
                rec["x"], rec["y"], rec["z"] = v[:, 0], v[:, 1], v[:, 2]
                rec["red"], rec["green"], rec["blue"] = (col[:, 0], col[:, 1],
                                                         col[:, 2])
                f.write(rec.tobytes())
            if fc is not None:
                for face in fc:
                    f.write(struct.pack("<B3i", 3, *face))
        else:
            for i, p in enumerate(v):
                row = f"{p[0]:.8g} {p[1]:.8g} {p[2]:.8g}"
                if col is not None:
                    row += f" {col[i, 0]} {col[i, 1]} {col[i, 2]}"
                f.write((row + "\n").encode())
            if fc is not None:
                for face in fc:
                    f.write(f"3 {face[0]} {face[1]} {face[2]}\n".encode())
