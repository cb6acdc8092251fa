"""Pure-Python legacy-VTK ASCII POLYDATA parser.

Replaces the reference's VTK 9.5 dependency (``src/Util/VTKReaderImpl.cpp``,
a GCC-compiled TU deliberately isolated from nvcc).  We parse only what the
renderer consumes:

* Time mode (``readVTKTimeFile``, VTKReaderImpl.cpp:140-248): per-point
  position + POINT_DATA arrays ``id`` (int), ``quat`` (4 doubles, w-x-y-z),
  ``vel`` (VECTORS), ``shape_id`` (int).
* Mesh mode (``readVTKMeshFile``, VTKReaderImpl.cpp:27-137): TRIANGLE_STRIPS
  cells (one strip per particle) decoded to triangle lists with the
  odd-triangle winding flip (:97-110), CELL_DATA arrays ``id``/``vel``, and
  smooth per-point vertex normals (the vtkPolyDataNormals equivalent:
  area-weighted face-normal average, consistently oriented).

The grammar is token-based, so layout quirks (trailing spaces, multi-value
lines) don't matter.  Unknown arrays are parsed and kept in ``point_data`` /
``cell_data`` dicts — the reference documents many parsed-but-unused fields
(VTKReaderImpl.cpp:183-248).
"""

from __future__ import annotations

import dataclasses

import numpy as np


class VTKParseError(ValueError):
    """Analog of the reference's VTK_READER_ERROR_EXIT_CODE=-1 fail-fast
    (include/Util/VTKMeshReader.cuh:7) — raised instead of exiting."""


_DTYPES = {
    "bit": np.uint8, "unsigned_char": np.uint8, "char": np.int8,
    "unsigned_short": np.uint16, "short": np.int16,
    "unsigned_int": np.uint32, "int": np.int32,
    "unsigned_long": np.uint64, "long": np.int64,
    "float": np.float32, "double": np.float64,
}


@dataclasses.dataclass
class PolyData:
    points: np.ndarray                      # (N, 3) float64
    vertices: list[np.ndarray]              # per-cell point-id arrays
    lines: list[np.ndarray]
    polygons: list[np.ndarray]
    triangle_strips: list[np.ndarray]
    point_data: dict[str, np.ndarray]
    cell_data: dict[str, np.ndarray]

    @property
    def num_points(self) -> int:
        return len(self.points)

    @property
    def num_cells(self) -> int:
        return (len(self.vertices) + len(self.lines) + len(self.polygons)
                + len(self.triangle_strips))


class _Tokens:
    __slots__ = ("toks", "pos")

    def __init__(self, text: str):
        self.toks = text.split()
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        if self.pos >= len(self.toks):
            raise VTKParseError("unexpected end of file")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def take(self, n: int) -> list[str]:
        if self.pos + n > len(self.toks):
            raise VTKParseError("unexpected end of file")
        out = self.toks[self.pos:self.pos + n]
        self.pos += n
        return out

    def done(self) -> bool:
        return self.pos >= len(self.toks)


def _read_cells(tk: _Tokens) -> list[np.ndarray]:
    n_cells = int(tk.next())
    total = int(tk.next())
    vals = np.asarray(tk.take(total), dtype=np.int64)
    cells = []
    pos = 0
    for _ in range(n_cells):
        cnt = int(vals[pos])
        cells.append(vals[pos + 1: pos + 1 + cnt])
        pos += 1 + cnt
    if pos != total:
        raise VTKParseError("cell section size mismatch")
    return cells


def parse_polydata(text: str) -> PolyData:
    """Parse a legacy ASCII VTK POLYDATA payload."""
    # strip the 2 header/comment lines by finding the ASCII/DATASET markers
    lines = text.splitlines()
    if not lines or not lines[0].lstrip().startswith("# vtk DataFile"):
        raise VTKParseError("not a legacy VTK file")
    body = "\n".join(lines[2:])  # line 0 version, line 1 free comment
    tk = _Tokens(body)

    fmt = tk.next().upper()
    if fmt != "ASCII":
        raise VTKParseError(f"only ASCII supported, got {fmt}")
    if tk.next().upper() != "DATASET" or tk.next().upper() != "POLYDATA":
        raise VTKParseError("only DATASET POLYDATA supported")

    pd = PolyData(points=np.zeros((0, 3)), vertices=[], lines=[],
                  polygons=[], triangle_strips=[], point_data={}, cell_data={})
    attr_target: dict[str, np.ndarray] | None = None
    attr_count = 0

    while not tk.done():
        kw = tk.next().upper()
        if kw == "POINTS":
            n = int(tk.next())
            tk.next()  # dtype
            pd.points = np.asarray(tk.take(3 * n), np.float64).reshape(n, 3)
        elif kw == "VERTICES":
            pd.vertices = _read_cells(tk)
        elif kw == "LINES":
            pd.lines = _read_cells(tk)
        elif kw == "POLYGONS":
            pd.polygons = _read_cells(tk)
        elif kw == "TRIANGLE_STRIPS":
            pd.triangle_strips = _read_cells(tk)
        elif kw == "POINT_DATA":
            attr_count = int(tk.next())
            attr_target = pd.point_data
        elif kw == "CELL_DATA":
            attr_count = int(tk.next())
            attr_target = pd.cell_data
        elif kw == "SCALARS":
            if attr_target is None:
                raise VTKParseError("SCALARS outside POINT_DATA/CELL_DATA")
            name = tk.next()
            dtype = _DTYPES.get(tk.next().lower(), np.float64)
            ncomp = 1
            if tk.peek() is not None and tk.peek().isdigit():
                ncomp = int(tk.next())
            if tk.peek() is not None and tk.peek().upper() == "LOOKUP_TABLE":
                tk.next()
                tk.next()  # table name
            vals = np.asarray(tk.take(attr_count * ncomp), np.float64)
            arr = vals.reshape(attr_count, ncomp) if ncomp > 1 else vals
            attr_target[name] = arr.astype(dtype) if ncomp == 1 else arr
        elif kw == "VECTORS":
            if attr_target is None:
                raise VTKParseError("VECTORS outside POINT_DATA/CELL_DATA")
            name = tk.next()
            tk.next()  # dtype
            attr_target[name] = np.asarray(
                tk.take(attr_count * 3), np.float64).reshape(attr_count, 3)
        elif kw == "NORMALS":
            if attr_target is None:
                raise VTKParseError("NORMALS outside POINT_DATA/CELL_DATA")
            name = tk.next()
            tk.next()
            attr_target[name] = np.asarray(
                tk.take(attr_count * 3), np.float64).reshape(attr_count, 3)
        elif kw == "FIELD":
            tk.next()  # field name
            narrays = int(tk.next())
            for _ in range(narrays):
                name = tk.next()
                ncomp = int(tk.next())
                ntup = int(tk.next())
                tk.next()  # dtype
                vals = np.asarray(tk.take(ncomp * ntup), np.float64)
                if attr_target is not None:
                    attr_target[name] = vals.reshape(ntup, ncomp) \
                        if ncomp > 1 else vals
        elif kw == "LOOKUP_TABLE":
            tk.next()
            n = int(tk.next())
            tk.take(4 * n)
        elif kw == "METADATA":
            # VTK >= 8 writes an INFORMATION block; skip until a blank-ish
            # known keyword — simplest: skip "INFORMATION n" pairs
            if tk.peek() and tk.peek().upper() == "INFORMATION":
                tk.next()
                n_info = int(tk.next())
                for _ in range(n_info * 2):
                    if tk.peek() and tk.peek().upper() in ("NAME", "DATA"):
                        tk.next()
                        tk.next()
        else:
            raise VTKParseError(f"unsupported VTK section: {kw}")
    return pd


def read_polydata(path) -> PolyData:
    with open(path, "r", errors="replace") as f:
        return parse_polydata(f.read())


# ---------------------------------------------------------------------------
# Renderer-facing views
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TimeFrame:
    """One Time-mode file: particle poses (readVTKTimeFile parity)."""
    positions: np.ndarray   # (P, 3) float32
    ids: np.ndarray         # (P,)  int64
    quats: np.ndarray       # (P, 4) float32, (w, x, y, z)
    velocities: np.ndarray  # (P, 3) float32
    shape_ids: np.ndarray   # (P,)  int64


def read_time_file(path) -> TimeFrame:
    pd = read_polydata(path)
    if pd.num_points == 0:
        raise VTKParseError(f"{path}: no points")
    n = pd.num_points

    def get(name, default=None):
        if name in pd.point_data:
            return pd.point_data[name]
        if default is None:
            raise VTKParseError(f"{path}: missing point array '{name}'")
        return default

    ids = get("id", np.arange(n)).astype(np.int64)
    quats = get("quat", np.tile([1.0, 0, 0, 0], (n, 1))).astype(np.float32)
    vel = get("vel", np.zeros((n, 3))).astype(np.float32)
    shape_ids = get("shape_id", np.zeros(n)).astype(np.int64)
    return TimeFrame(positions=pd.points.astype(np.float32), ids=ids,
                     quats=quats.reshape(n, 4), velocities=vel.reshape(n, 3),
                     shape_ids=shape_ids)


@dataclasses.dataclass
class MeshFrame:
    """One Mesh-mode file: per-particle triangle soups (readVTKMeshFile
    parity — one TRIANGLE_STRIPS cell per particle)."""
    ids: np.ndarray                  # (P,) int64
    velocities: np.ndarray           # (P, 3) float32
    vertices: list[np.ndarray]       # per particle (t_i, 3, 3) float32
    normals: list[np.ndarray]        # per particle (t_i, 3, 3) float32


def smooth_point_normals(points: np.ndarray,
                         strips: list[np.ndarray]) -> np.ndarray:
    """Per-point normals: area-weighted average of adjacent face normals,
    globally oriented outward from the centroid (the practical equivalent of
    vtkPolyDataNormals with splitting off + auto-orient,
    VTKReaderImpl.cpp:53-63)."""
    acc = np.zeros_like(points)
    for strip in strips:
        for k in range(len(strip) - 2):
            i0, i1, i2 = strip[k], strip[k + 1], strip[k + 2]
            if k & 1:
                i1, i2 = i2, i1
            fn = np.cross(points[i1] - points[i0], points[i2] - points[i0])
            acc[i0] += fn
            acc[i1] += fn
            acc[i2] += fn
    norms = np.linalg.norm(acc, axis=-1, keepdims=True)
    acc = np.divide(acc, norms, out=np.zeros_like(acc), where=norms > 1e-30)
    # orient outward from centroid (auto-orient approximation)
    centroid = points.mean(axis=0)
    outward = points - centroid
    flip = (acc * outward).sum(-1, keepdims=True) < 0
    if flip.mean() > 0.5:  # majority vote for global consistency
        acc = -acc
    return acc


def read_mesh_file(path) -> MeshFrame:
    pd = read_polydata(path)
    if pd.num_points == 0:
        raise VTKParseError(f"{path}: no points")
    if not pd.triangle_strips:
        raise VTKParseError(
            f"{path}: mesh mode requires TRIANGLE_STRIPS cells "
            f"(reference exits on other cell types, VTKReaderImpl.cpp:72-75)")
    n_cells = len(pd.triangle_strips)
    if "id" not in pd.cell_data or "vel" not in pd.cell_data:
        raise VTKParseError(f"{path}: missing cell arrays id/vel")

    pts = pd.points.astype(np.float32)
    pnormals = smooth_point_normals(pts, pd.triangle_strips).astype(np.float32)

    verts_all, normals_all = [], []
    for strip in pd.triangle_strips:
        ntri = max(len(strip) - 2, 0)
        v = np.zeros((ntri, 3, 3), np.float32)
        nn = np.zeros((ntri, 3, 3), np.float32)
        for k in range(ntri):
            i0, i1, i2 = strip[k], strip[k + 1], strip[k + 2]
            if k & 1:  # odd-triangle winding flip (VTKReaderImpl.cpp:97-110)
                i1, i2 = i2, i1
            v[k] = pts[[i0, i1, i2]]
            nn[k] = pnormals[[i0, i1, i2]]
        verts_all.append(v)
        normals_all.append(nn)

    return MeshFrame(
        ids=pd.cell_data["id"].astype(np.int64).reshape(n_cells),
        velocities=pd.cell_data["vel"].astype(np.float32).reshape(n_cells, 3),
        vertices=verts_all, normals=normals_all)
