"""Minimal OBJ / PLY triangle-mesh IO (no trimesh offline — SURVEY.md s2.2).

Writers emit the formats the lineage's reconstruction stage produces
(OBJ plus ascii AND binary_little_endian PLY — the DeepSDF lineage's
mesh outputs and ShapeNet's on-disk PLYs are binary little-endian); the
reader handles the common subsets needed to round-trip our own output
and ingest external meshes for the native preprocess path (float/double
vertex properties located by name, uchar/uint-counted face index lists).
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
              faces: np.ndarray, binary: bool = False) -> None:
    """Triangle mesh -> PLY. binary=True writes binary_little_endian 1.0
    (float32 xyz + `list uchar int` faces — the canonical DeepSDF output
    layout); binary=False writes ascii 1.0. Either round-trips through
    read_ply and the native preprocess loader losslessly (f32 verts)."""
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    fmt = "binary_little_endian" if binary else "ascii"
    header = (f"ply\nformat {fmt} 1.0\n"
              f"element vertex {len(verts)}\n"
              "property float x\nproperty float y\nproperty float z\n"
              f"element face {len(faces)}\n"
              "property list uchar int vertex_indices\nend_header\n")
    if binary:
        face_rec = np.empty(
            len(faces), np.dtype([("n", "u1"), ("idx", "<i4", (3,))]))
        face_rec["n"] = 3
        face_rec["idx"] = faces
        with p.open("wb") as f:
            f.write(header.encode("ascii"))
            f.write(np.ascontiguousarray(verts, "<f4").tobytes())
            f.write(face_rec.tobytes())
        return
    with p.open("w") as f:
        f.write(header)
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def write_mesh(path: str | pathlib.Path, verts: np.ndarray,
               faces: np.ndarray) -> None:
    """Extension-dispatched writer: .obj -> OBJ, .ply -> binary PLY."""
    ext = pathlib.Path(path).suffix.lower()
    if ext == ".obj":
        write_obj(path, verts, faces)
    elif ext == ".ply":
        write_ply(path, verts, faces, binary=True)
    else:
        raise ValueError(f"unsupported mesh format: {path}")


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


# PLY scalar type name -> numpy little-endian dtype
_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "<i2", "int16": "<i2", "ushort": "<u2", "uint16": "<u2",
    "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
}


def _parse_ply_header(raw: bytes) -> tuple:
    """-> (fmt, elements [(name, count, props)], body offset). props is
    [(name, dtype_str)] for scalars, ('list', count_dt, idx_dt, name)
    for list properties."""
    end = raw.find(b"end_header\n")
    if not raw.startswith(b"ply") or end < 0:
        raise ValueError("not a PLY file")
    fmt = None
    elements = []
    for line in raw[:end].decode("ascii").splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property" and elements:
            if parts[1] == "list":
                elements[-1][2].append(
                    ("list", _PLY_DTYPES[parts[2]], _PLY_DTYPES[parts[3]],
                     parts[4]))
            else:
                elements[-1][2].append((parts[2], _PLY_DTYPES[parts[1]]))
    if fmt not in ("ascii", "binary_little_endian"):
        raise ValueError(f"unsupported PLY format: {fmt}")
    return fmt, elements, end + len(b"end_header\n")


def _fan(idx_rows) -> np.ndarray:
    faces = []
    for idx in idx_rows:
        for k in range(1, len(idx) - 1):
            faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(faces, np.int64).reshape(-1, 3)


def read_ply(path: str | pathlib.Path) -> tuple:
    """ascii or binary_little_endian PLY -> (verts f32 [N,3], faces i64
    [M,3]); polygons are fan-triangulated. Vertex x/y/z are located by
    property NAME (extra per-vertex floats — normals, colors — are
    skipped); faces must lead with their index list property."""
    raw = pathlib.Path(path).read_bytes()
    fmt, elements, off = _parse_ply_header(raw)
    verts = np.zeros((0, 3), np.float32)
    faces = np.zeros((0, 3), np.int64)
    if fmt == "ascii":
        lines = raw[off:].decode("ascii").splitlines()
        row = 0
        for name, count, props in elements:
            if name == "vertex":
                cols = [i for i, pr in enumerate(props)
                        if pr[0] in ("x", "y", "z")]
                assert len(cols) == 3, "vertex needs x/y/z properties"
                verts = np.asarray(
                    [[float(lines[row + j].split()[c]) for c in cols]
                     for j in range(count)], np.float32)
            elif name == "face":
                assert props and props[0][0] == "list"
                idx_rows = []
                for j in range(count):
                    toks = lines[row + j].split()
                    idx_rows.append([int(x)
                                     for x in toks[1:1 + int(toks[0])]])
                faces = _fan(idx_rows)
            row += count
        return verts, faces
    # binary_little_endian
    buf = memoryview(raw)[off:]
    pos = 0
    for name, count, props in elements:
        if name == "vertex":
            if any(pr[0] == "list" for pr in props):
                raise ValueError("list property on vertex unsupported")
            rec = np.dtype([(f"p{i}", dt) for i, (_n, dt)
                            in enumerate(props)])
            arr = np.frombuffer(buf, rec, count, pos)
            cols = [f"p{i}" for i, pr in enumerate(props)
                    if pr[0] in ("x", "y", "z")]
            assert len(cols) == 3, "vertex needs x/y/z properties"
            verts = np.stack([arr[c].astype(np.float32) for c in cols],
                             axis=-1)
            pos += rec.itemsize * count
        elif name == "face":
            assert props and props[0][0] == "list", \
                "face element must lead with its index list"
            assert len(props) == 1, "extra face properties unsupported"
            _tag, cdt, idt, _nm = props[0]
            csz = np.dtype(cdt).itemsize
            isz = np.dtype(idt).itemsize
            if count:
                k0 = int(np.frombuffer(buf, cdt, 1, pos)[0])
                uniform = np.dtype([("n", cdt), ("idx", idt, (k0,))])
                if pos + uniform.itemsize * count <= len(buf):
                    recs = np.frombuffer(buf, uniform, count, pos)
                    if (recs["n"] == k0).all():
                        faces = _fan(recs["idx"]) if k0 != 3 else \
                            recs["idx"].astype(np.int64)
                        pos += uniform.itemsize * count
                        continue
                idx_rows = []          # ragged polygon sizes: walk records
                for _ in range(count):
                    k = int(np.frombuffer(buf, cdt, 1, pos)[0])
                    idx_rows.append(np.frombuffer(buf, idt, k, pos + csz)
                                    .astype(np.int64))
                    pos += csz + isz * k
                faces = _fan(idx_rows)
        else:  # skip unknown scalar-only elements
            rec = np.dtype([(f"p{i}", dt) for i, (_n, dt)
                            in enumerate(props)])
            pos += rec.itemsize * count
    return verts, faces


def read_ply_ascii(path: str | pathlib.Path) -> tuple:
    """Back-compat alias (read_ply handles ascii AND binary)."""
    return read_ply(path)
