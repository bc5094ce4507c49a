"""Native host-side runtime (C++ via ctypes) with pure-Python fallbacks.

Reference equivalents: PartioIO (#19), PlyIO (#17), VdbLevelSet inside
sampling (#17), and host-side particle sorting — the parts of the
reference's runtime that are C++ and stay native here. The shared library
is compiled lazily with g++ on first use and cached next to the source;
every entry point has a numpy fallback so the package works without a
toolchain (and the tests assert native == fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native.cpp")
_LIB = None
_TRIED = False


def _build_lib():
    """Compile native.cpp -> cached .so; returns path or None."""
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "hot_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    src_mtime = os.path.getmtime(_SRC)
    so_path = os.path.join(cache_dir, "hot_tpu_native.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= src_mtime:
        return so_path
    with tempfile.TemporaryDirectory() as td:
        tmp_so = os.path.join(td, "hot_tpu_native.so")
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
               _SRC, "-o", tmp_so]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            # retry without OpenMP (minimal toolchains)
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
                   "-o", tmp_so]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        os.replace(tmp_so, so_path)
    return so_path


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build_lib()
        if so is not None:
            lib = ctypes.CDLL(so)
            c_i64 = ctypes.c_int64
            c_pf = ctypes.POINTER(ctypes.c_float)
            c_pd = ctypes.POINTER(ctypes.c_double)
            c_pi32 = ctypes.POINTER(ctypes.c_int32)
            c_pi64 = ctypes.POINTER(ctypes.c_int64)
            c_pu8 = ctypes.POINTER(ctypes.c_uint8)
            lib.ht_write_bgeo.argtypes = [ctypes.c_char_p, c_i64, c_pf, c_pf]
            lib.ht_write_bgeo.restype = ctypes.c_int
            lib.ht_write_ply.argtypes = [ctypes.c_char_p, c_i64, c_pf, c_pf]
            lib.ht_write_ply.restype = ctypes.c_int
            lib.ht_write_vtk.argtypes = [ctypes.c_char_p, c_i64, c_pf, c_pf]
            lib.ht_write_vtk.restype = ctypes.c_int
            lib.ht_inside_mesh.argtypes = [c_i64, c_pd, c_i64, c_pi64, c_i64,
                                           c_pd, c_pu8]
            lib.ht_inside_mesh.restype = ctypes.c_int
            lib.ht_counting_sort.argtypes = [c_i64, c_pi32, c_i64, c_pi32, c_pi32]
            lib.ht_counting_sort.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def have_native() -> bool:
    return _lib() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ---------------------------------------------------------------------------
# frame writers
# ---------------------------------------------------------------------------


def write_bgeo(path: str, x, v=None):
    """Classic Houdini BGEO v5 frame (what the reference's partio writes).

    x: (n, 3) positions; v: optional (n, 3) velocities. 2D inputs are
    zero-padded to 3D. Pure-Python fallback writes the identical bytes.
    """
    x = _to3(np.asarray(x, np.float32))
    v3 = None if v is None else _to3(np.asarray(v, np.float32))
    lib = _lib()
    if lib is not None:
        rc = lib.ht_write_bgeo(
            path.encode(), x.shape[0], _fptr(np.ascontiguousarray(x)),
            _fptr(np.ascontiguousarray(v3)) if v3 is not None else None,
        )
        if rc != 0:
            raise IOError(f"bgeo write failed ({rc}): {path}")
        return
    _write_bgeo_py(path, x, v3)


def _write_bgeo_py(path, x, v):
    import struct

    n = x.shape[0]
    out = bytearray()
    out += b"BgeoV"
    out += struct.pack(">iiiiiiiii", 5, n, 0, 0, 0, 1 if v is not None else 0,
                       0, 0, 0)
    if v is not None:
        out += struct.pack(">H", 1) + b"v"
        out += struct.pack(">Hi", 3, 0)
        out += struct.pack(">fff", 0.0, 0.0, 0.0)
    pts = np.concatenate([x, np.ones((n, 1), np.float32)], axis=1)
    if v is not None:
        pts = np.concatenate([pts, v], axis=1)
    out += pts.astype(">f4").tobytes()
    out += bytes([0x00, 0xFF])
    with open(path, "wb") as fh:
        fh.write(out)


def read_bgeo(path: str):
    """Read back a BGEO written by write_bgeo (round-trip validation and
    resuming renders); returns (x (n,3), v (n,3) or None)."""
    import struct

    with open(path, "rb") as fh:
        raw = fh.read()
    assert raw[:5] == b"BgeoV", "not a classic BGEO"
    (version, n, nprims, npg, nprg, npa, nva, npra, na) = struct.unpack(
        ">iiiiiiiii", raw[5:41]
    )
    assert version == 5
    off = 41
    width = 4  # homogeneous position
    have_v = False
    for _ in range(npa):
        (ln,) = struct.unpack(">H", raw[off:off + 2])
        off += 2
        name = raw[off:off + ln].decode()
        off += ln
        size, typ = struct.unpack(">Hi", raw[off:off + 6])
        off += 6 + 4 * size  # skip defaults
        width += size
        if name == "v":
            have_v = True
    data = np.frombuffer(raw, dtype=">f4", count=n * width, offset=off)
    data = data.reshape(n, width).astype(np.float32)
    x = data[:, :3]
    v = data[:, 4:7] if have_v else None
    return x, v


def write_ply(path: str, x, v=None):
    """Binary little-endian PLY point cloud (reference PlyIO, #17)."""
    x = _to3(np.asarray(x, np.float32))
    v3 = None if v is None else _to3(np.asarray(v, np.float32))
    lib = _lib()
    if lib is not None:
        rc = lib.ht_write_ply(
            path.encode(), x.shape[0], _fptr(np.ascontiguousarray(x)),
            _fptr(np.ascontiguousarray(v3)) if v3 is not None else None,
        )
        if rc != 0:
            raise IOError(f"ply write failed ({rc}): {path}")
        return
    with open(path, "wb") as fh:
        props = "property float x\nproperty float y\nproperty float z\n"
        if v3 is not None:
            props += "property float vx\nproperty float vy\nproperty float vz\n"
        fh.write(
            (f"ply\nformat binary_little_endian 1.0\n"
             f"element vertex {x.shape[0]}\n{props}end_header\n").encode()
        )
        data = x if v3 is None else np.concatenate([x, v3], axis=1)
        fh.write(np.ascontiguousarray(data, "<f4").tobytes())


def write_vtk(path: str, x, v=None):
    """Legacy VTK binary POLYDATA point cloud (reference VtkIO, #17):
    POINTS + per-point VERTICES cells + optional velocity VECTORS.
    Pure-Python fallback writes the identical bytes."""
    x = _to3(np.asarray(x, np.float32))
    v3 = None if v is None else _to3(np.asarray(v, np.float32))
    lib = _lib()
    if lib is not None:
        rc = lib.ht_write_vtk(
            path.encode(), x.shape[0], _fptr(np.ascontiguousarray(x)),
            _fptr(np.ascontiguousarray(v3)) if v3 is not None else None,
        )
        if rc != 0:
            raise IOError(f"vtk write failed ({rc}): {path}")
        return
    n = x.shape[0]
    out = bytearray()
    out += (b"# vtk DataFile Version 3.0\nhot_tpu particles\nBINARY\n"
            b"DATASET POLYDATA\n")
    out += f"POINTS {n} float\n".encode()
    out += np.ascontiguousarray(x, ">f4").tobytes()
    out += f"\nVERTICES {n} {2 * n}\n".encode()
    cells = np.empty((n, 2), ">i4")
    cells[:, 0] = 1
    cells[:, 1] = np.arange(n)
    out += cells.tobytes()
    if v3 is not None:
        out += f"\nPOINT_DATA {n}\nVECTORS v float\n".encode()
        out += np.ascontiguousarray(v3, ">f4").tobytes()
    out += b"\n"
    with open(path, "wb") as fh:
        fh.write(out)


def _to3(a):
    if a.shape[1] == 3:
        return a
    out = np.zeros((a.shape[0], 3), np.float32)
    out[:, : a.shape[1]] = a
    return out


# ---------------------------------------------------------------------------
# mesh inside test + counting sort
# ---------------------------------------------------------------------------


def inside_mesh(verts, faces, pts):
    """Ray-parity inside mask for watertight meshes; (np,) bool.

    Same rules as hot_tpu.io.mesh.points_inside_mesh (which is the numpy
    fallback); the native path parallelizes over samples with OpenMP —
    this is the 10M-particle seeding path for mesh scenes.
    """
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    pts = np.ascontiguousarray(pts, np.float64)
    lib = _lib()
    if lib is not None:
        out = np.zeros(pts.shape[0], np.uint8)
        rc = lib.ht_inside_mesh(
            verts.shape[0],
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            faces.shape[0],
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            pts.shape[0],
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise RuntimeError("inside_mesh failed")
        return out.astype(bool)
    from hot_tpu.io.mesh import points_inside_mesh

    return points_inside_mesh(pts, verts, faces)


def counting_sort(cell_ids, n_cells: int):
    """(order, starts): permutation sorting particles by cell + segment
    starts. Native O(n) counting sort; numpy argsort fallback."""
    cell_ids = np.ascontiguousarray(cell_ids, np.int32)
    n = cell_ids.shape[0]
    lib = _lib()
    if lib is not None:
        order = np.zeros(n, np.int32)
        starts = np.zeros(n_cells + 1, np.int32)
        rc = lib.ht_counting_sort(
            n, cell_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_cells,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise ValueError("cell id out of range")
        return order, starts
    order = np.argsort(cell_ids, kind="stable").astype(np.int32)
    starts = np.zeros(n_cells + 1, np.int32)
    np.add.at(starts, cell_ids + 1, 1)
    starts = np.cumsum(starts, dtype=np.int32)
    return order, starts
