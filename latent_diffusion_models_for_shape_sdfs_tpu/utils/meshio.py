"""Minimal OBJ / PLY triangle-mesh IO (no trimesh offline — SURVEY.md s2.2).

Writers emit the formats the lineage's reconstruction stage produces
(binary-less ascii PLY + OBJ); the reader handles the common subsets needed
to round-trip our own output and ingest simple external meshes for the
native preprocess path.
"""

from __future__ import annotations

import pathlib

import numpy as np


def write_obj(path: str | pathlib.Path, verts: np.ndarray,
              faces: np.ndarray) -> None:
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with p.open("w") as f:
        for v in np.asarray(verts, np.float64):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in np.asarray(faces, np.int64) + 1:  # OBJ is 1-indexed
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def write_ply(path: str | pathlib.Path, verts: np.ndarray,
              faces: np.ndarray) -> None:
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    with p.open("w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def read_obj(path: str | pathlib.Path) -> tuple:
    """Reads v/f lines; polygonal faces are fan-triangulated."""
    verts, faces = [], []
    for line in pathlib.Path(path).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            verts.append([float(x) for x in parts[1:4]])
        elif parts[0] == "f":
            idx = [int(tok.split("/")[0]) - 1 for tok in parts[1:]]
            for k in range(1, len(idx) - 1):
                faces.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int64).reshape(-1, 3))


def read_ply_ascii(path: str | pathlib.Path) -> tuple:
    lines = pathlib.Path(path).read_text().splitlines()
    n_v = n_f = 0
    i = 0
    for i, line in enumerate(lines):
        parts = line.split()
        if parts[:2] == ["element", "vertex"]:
            n_v = int(parts[2])
        elif parts[:2] == ["element", "face"]:
            n_f = int(parts[2])
        elif parts[:1] == ["end_header"]:
            break
    body = lines[i + 1:]
    verts = np.asarray([[float(x) for x in body[j].split()[:3]]
                        for j in range(n_v)], np.float32)
    faces = []
    for j in range(n_v, n_v + n_f):
        toks = body[j].split()
        idx = [int(x) for x in toks[1:1 + int(toks[0])]]
        for k in range(1, len(idx) - 1):
            faces.append([idx[0], idx[k], idx[k + 1]])
    return verts, np.asarray(faces, np.int64).reshape(-1, 3)
