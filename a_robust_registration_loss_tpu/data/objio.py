"""Wavefront OBJ point-cloud IO.

Replaces the reference's use of libigl (``igl.read_triangle_mesh`` /
``igl.write_obj``, e.g. test_demo_optimized_Lie_Algebra.py:112-113 and
dcp/Train_DCP.py:510-517). The reference only ever reads vertices (its
sample data are point clouds; every write uses a dummy 1x3 zero face,
dcp/Train_DCP.py:512), so the format surface needed is tiny.

A native C++ fast path (see ``a_robust_registration_loss_tpu/native``) is
used automatically when its shared library has been built; the pure-Python
path is the always-available fallback and the semantics oracle.
"""

from __future__ import annotations

import os

import numpy as np


def _native():
    try:
        from a_robust_registration_loss_tpu.native import objio_native

        return objio_native if objio_native.available() else None
    except Exception:
        return None


def read_obj(path: str):
    """Read an OBJ file -> (vertices (N, 3) float32, faces (F, 3) int32).

    Handles `v x y z` and `f a b c` (1-based, with optional /vt/vn suffixes);
    everything else is ignored — matching what igl.read_triangle_mesh
    provides to the reference pipeline.
    """
    nat = _native()
    if nat is not None:
        return nat.read_obj(path)
    verts, faces = [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("f "):
                parts = line.split()[1:4]
                faces.append(tuple(int(p.split("/")[0]) - 1 for p in parts))
    v = np.asarray(verts, dtype=np.float32).reshape(-1, 3)
    f = np.asarray(faces, dtype=np.int32).reshape(-1, 3)
    return v, f


def write_obj(path: str, vertices, faces=None):
    """Write vertices (N, 3) (+ optional faces (F, 3), 0-based) as OBJ.

    The reference writes point clouds with a dummy zero face
    (dcp/Train_DCP.py:510-517); we simply omit faces when not given.
    """
    vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    nat = _native()
    if nat is not None:
        nat.write_obj(path, vertices, faces)
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.8g} {v[1]:.8g} {v[2]:.8g}\n")
        if faces is not None:
            for face in np.asarray(faces, dtype=np.int64).reshape(-1, 3):
                f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")
