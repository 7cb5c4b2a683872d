"""Native C++ IO runtime tests (csrc/io.cpp via ctypes)."""

import numpy as np
import pytest

from spectral_tpu.utils import native


def test_native_available():
    assert native.available(), "g++ toolchain expected in this image"


def test_format_rows_matches_python():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 3))
    got = native.format_rows(a)
    ref = "\n".join(" ".join(f"{v:20e}" for v in row) + " " for row in a)
    assert got == ref.rstrip("\n")


def test_format_tensors():
    a = np.arange(18.0).reshape(2, 3, 3)
    out = native.format_tensors(a)
    # 2 nodes x (3 lines + blank)
    assert out.count("\n") == 8


def test_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.standard_normal(1000)
    p = str(tmp_path / "x.blob")
    native.write_blob(p, a)
    b = native.read_blob(p, 1000)
    np.testing.assert_array_equal(a, b)


def test_vtk_writer_end_to_end(tmp_path):
    """-output_vtk analog (stokes.C:238-241): file structure matches the
    reference's legacy VTK layout."""
    import jax.numpy as jnp
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.utils.vtk import write_stokes_vtk

    p = StokesProblem(Grid((6, 5)), StokesConfig(exact=2))
    path = str(tmp_path / "stokes.vtk")
    write_stokes_vtk(p, p.exact_state(), path)
    text = open(path).read()
    for key in ("STRUCTURED_GRID", "DIMENSIONS 6 5 1", "VECTORS velocity",
                "SCALARS pressure", "VECTORS vel_force", "SCALARS div_force",
                "SCALARS eta", "SCALARS deta", "TENSORS strain"):
        assert key in text, key
    assert len(text.splitlines()) > 100
