"""Mesh export without external deps (replaces trimesh usage,
reference: utils/utils.py:418-426). Binary little-endian PLY."""

from __future__ import annotations

import os
import struct

import numpy as np


def save_ply(vertices: np.ndarray, faces: np.ndarray, path: str) -> None:
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(vertices)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        fh.write(vertices.astype("<f4").tobytes())
        counts = np.full((len(faces), 1), 3, np.uint8)
        rows = b"".join(
            struct.pack("<B3i", 3, *face) for face in faces
        ) if len(faces) < 100000 else None
        if rows is not None:
            fh.write(rows)
        else:  # fast path for big meshes
            rec = np.zeros(len(faces), dtype=[("n", "u1"), ("idx", "<i4", 3)])
            rec["n"] = 3
            rec["idx"] = faces
            fh.write(rec.tobytes())


def load_obj(path: str):
    """Minimal OBJ reader (v / vt / f), replaces utils/utils.py:229-281.

    Returns (verts [V,3] float32, uvs [T,2] float32 or None,
    faces [F,3] int32 vertex indices, 0-based).
    """
    verts, uvs, faces = [], [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(t) for t in line.split()[1:4]])
            elif line.startswith("vt "):
                uvs.append([float(t) for t in line.split()[1:3]])
            elif line.startswith("f "):
                idx = [tok.split("/")[0] for tok in line.split()[1:4]]
                faces.append([int(t) - 1 for t in idx])
    return (
        np.asarray(verts, np.float32),
        np.asarray(uvs, np.float32) if uvs else None,
        np.asarray(faces, np.int32),
    )
