"""Tests for utils/export.py (npz snapshots + legacy VTK for ParaView).

The VTK test parses the written bytes back independently (header grammar
+ big-endian payload) rather than trusting the writer's own reader — the
format contract is with external tools."""

import json

import numpy as np

from phys_autodiff_tpu.utils import export
from phys_autodiff_tpu.utils.config import GridSpec


def _grid():
    return GridSpec(nx=6, ny=5, nz=4, hx=0.5, hy=0.25, hz=0.125, dt=1e-3)


def _fields(g, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.normal(size=g.shape).astype(np.float32),
        rng.normal(size=(3,) + g.shape).astype(np.float32),
    )


def test_npz_roundtrip(tmp_path):
    g = _grid()
    sigma, u = _fields(g)
    p = export.save_fields_npz(
        str(tmp_path / "snap"), g, {"sigma": sigma, "u": u}, t=0.25
    )
    fields, meta = export.load_fields_npz(p)
    np.testing.assert_array_equal(fields["sigma"], sigma)
    np.testing.assert_array_equal(fields["u"], u)
    assert meta["nx"] == g.nx and meta["hz"] == g.hz
    assert meta["t"] == 0.25 and meta["periodic"] is True


def test_vtk_layout_and_payload(tmp_path):
    g = _grid()
    sigma, u = _fields(g, seed=1)
    p = export.write_vtk(str(tmp_path / "snap"), g, {"sigma": sigma, "u": u})
    raw = open(p, "rb").read()

    # header grammar
    head, rest = raw.split(b"POINT_DATA", 1)
    assert head.startswith(b"# vtk DataFile Version 3.0\n")
    assert b"BINARY\n" in head and b"DATASET STRUCTURED_POINTS\n" in head
    assert f"DIMENSIONS {g.nx} {g.ny} {g.nz}\n".encode() in head
    assert f"SPACING {g.hx} {g.hy} {g.hz}\n".encode() in head

    n = g.num_cells
    # scalar section: after its two header lines, n big-endian f32
    s_hdr = b"SCALARS sigma float 1\nLOOKUP_TABLE default\n"
    i = raw.index(s_hdr) + len(s_hdr)
    got = np.frombuffer(raw[i : i + 4 * n], dtype=">f4").astype(np.float32)
    # VTK point order is x-fastest == C-order ravel of [nz, ny, nx]
    np.testing.assert_array_equal(got, sigma.ravel())
    # spot-check one specific (z, y, x) cell's flat position
    z, y, x = 2, 3, 4
    assert got[(z * g.ny + y) * g.nx + x] == sigma[z, y, x]

    v_hdr = b"VECTORS u float\n"
    j = raw.index(v_hdr) + len(v_hdr)
    gotv = np.frombuffer(raw[j : j + 12 * n], dtype=">f4").astype(np.float32)
    np.testing.assert_array_equal(
        gotv.reshape(g.shape + (3,)), np.moveaxis(u, 0, -1)
    )


def test_vtk_rejects_bad_shape(tmp_path):
    g = _grid()
    bad = np.zeros((2,) + g.shape, np.float32)
    try:
        export.write_vtk(str(tmp_path / "bad"), g, {"f": bad})
    except ValueError as e:
        assert "expected" in str(e)
    else:
        raise AssertionError("shape (2, nz, ny, nx) must be rejected")


def test_vtk_series_index(tmp_path):
    g = _grid()
    sigma, u = _fields(g, seed=2)
    frames = [{"sigma": sigma * (i + 1)} for i in range(3)]
    prefix = str(tmp_path / "run")
    paths = export.write_vtk_series(prefix, g, frames, dt_frame=0.5)
    assert [p.endswith(f"_{i:04d}.vtk") for i, p in enumerate(paths)] == [
        True, True, True,
    ]
    series = json.load(open(prefix + ".vtk.series"))
    assert [e["time"] for e in series["files"]] == [0.0, 0.5, 1.0]
    assert series["files"][2]["name"] == "run_0002.vtk"
