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


def _fallback_write(path, a):
    """Python fallback body of write_blob (lib is None branch)."""
    import struct
    a = np.ascontiguousarray(a, dtype=np.float64).reshape(-1)
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", native._BLOB_MAGIC, a.size))
        a.astype("<f8", copy=False).tofile(f)


def _fallback_read(path, n):
    import struct
    with open(path, "rb") as f:
        magic, count = struct.unpack("<QQ", f.read(16))
        assert magic == native._BLOB_MAGIC and count == n
        return np.fromfile(f, dtype="<f8", count=n)


def test_blob_format_native_fallback_compat(tmp_path):
    """Both writers emit the same on-disk format (ADVICE round 1, medium):
    a blob written natively must read via the fallback and vice versa."""
    if not native.available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(2)
    a = rng.standard_normal(257)
    p1 = str(tmp_path / "native.blob")
    native.write_blob(p1, a)          # native path
    np.testing.assert_array_equal(_fallback_read(p1, 257), a)
    p2 = str(tmp_path / "fallback.blob")
    _fallback_write(p2, a)            # fallback path
    np.testing.assert_array_equal(native.read_blob(p2, 257), a)
