"""Checkpoint/resume and profiling utility tests (SURVEY.md sections 5.1, 5.4)."""

import jax.numpy as jnp
import numpy as np

from spectral_tpu.utils import checkpoint as ckpt
from spectral_tpu.utils.profiling import PhaseTimer


def test_checkpoint_roundtrip(tmp_path):
    x = {"v": jnp.arange(6.0).reshape(2, 3), "p": jnp.ones(4)}
    ckpt.save_state(str(tmp_path), 2, x, meta={"exponent": 1.5})
    assert ckpt.latest_step(str(tmp_path)) == 2
    y = ckpt.load_state(str(tmp_path), 2, x)
    np.testing.assert_allclose(np.asarray(y["v"]), np.asarray(x["v"]))
    np.testing.assert_allclose(np.asarray(y["p"]), np.asarray(x["p"]))
    assert ckpt.load_meta(str(tmp_path), 2)["exponent"] == 1.5


def test_continuation_resume(tmp_path):
    """Kill-and-resume: a second run skips the completed steps."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    cfg = StokesConfig(exact=2, rheology=1, cont=1, regularization=1e-1,
                       exponent=2.0)
    p = StokesProblem(Grid((8, 8)), cfg)
    r1 = p.solve_continuation(checkpoint_dir=str(tmp_path))
    assert len(r1) == 2  # steps 0, 1
    r2 = p.solve_continuation(checkpoint_dir=str(tmp_path))
    assert len(r2) == 0  # everything resumed/complete


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a", sync=False):
        pass
    with t.phase("a", sync=False):
        pass
    with t.phase("b", sync=False):
        pass
    s = t.summary()
    assert "a" in s and "b" in s
    assert t.counts["a"] == 2


def test_orbax_backend_roundtrip(tmp_path):
    pytest = __import__("pytest")
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax not installed")
    x = {"v": jnp.arange(4.0), "p": jnp.ones((2, 2))}
    ckpt.save_state_orbax(str(tmp_path), 3, x)
    y = ckpt.load_state_orbax(str(tmp_path), 3, like=x)
    np.testing.assert_allclose(np.asarray(y["v"]), np.asarray(x["v"]))


def test_check_finite():
    from spectral_tpu.utils.debug import check_finite

    check_finite({"a": jnp.ones(3)}, "ok")
    import pytest

    with pytest.raises(FloatingPointError):
        check_finite({"a": jnp.asarray([1.0, float("nan")])}, "bad")


def test_latest_step_five_digits(tmp_path):
    """latest_step must parse the full step number (ADVICE round 1):
    step 10000 widens past the 04d padding and must still win."""
    import numpy as np
    from spectral_tpu.utils import checkpoint as ckpt

    d = str(tmp_path)
    for step in (3, 9999, 10000):
        ckpt.save_state(d, step, {"x": np.zeros(2)})
    assert ckpt.latest_step(d) == 10000


def test_trace_summary_parses_xplane(tmp_path):
    """trace_summary runs a callable under jax.profiler and parses the
    xplane protobuf (the round-3 dispatch-vs-kernel evidence path).  On the
    CPU test platform there is no /device: plane; the host plane must still
    carry the traced compute."""
    import jax

    from spectral_tpu.utils.profiling import trace_summary

    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a)
    f(x).block_until_ready()
    s = trace_summary(lambda: [f(x).block_until_ready() for _ in range(3)],
                      trace_dir=str(tmp_path))
    assert s["wall_ms"] > 0
    assert any(k.startswith("/host") or k.startswith("/device")
               for k in s["planes"])
    assert sum(s["planes"].values()) > 0


def test_production_path_toggle():
    """bench.py promotes the measured winner; the toggle validates names
    and round-trips."""
    from spectral_tpu.ops import chebyshev as cheb

    orig = cheb.production_path()
    try:
        cheb.set_production_path("pallas")
        assert cheb.production_path() == "pallas"
        cheb.set_production_path("matmul")
        assert cheb.production_path() == "matmul"
        try:
            cheb.set_production_path("nope")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
    finally:
        cheb.set_production_path(orig)
