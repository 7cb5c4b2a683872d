"""Options database + CLI driver tests.

Oracle: the PETSc options DB semantics the reference relies on (prefix
namespacing, -flag presence, int arrays; SURVEY.md section 5.6)."""

import numpy as np

from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.utils.options import Options


def test_parse_basic():
    o = Options(["-dim", "12,12,12", "-exact", "2", "-ksp_rtol", "1e-10",
                 "-output_vtk", "-gamma", "-0.5"])
    assert o.get_int_array("dim", ()) == (12, 12, 12)
    assert o.get_int("exact", 0) == 2
    assert o.get_real("ksp_rtol", 1e-5) == 1e-10
    assert o.has("output_vtk")
    assert o.get_real("gamma", 0.0) == -0.5
    assert o.get_int("missing", 7) == 7


def test_prefixed_ksp_configs():
    """The stokes README config: -schur_ksp_max_it 3 -vel_ksp_max_it 4
    -svel_ksp_type preonly -ksp_type fgmres (README:43)."""
    o = Options("-exact 2 -cont0 1 -schur_ksp_max_it 3 -vel_ksp_max_it 4 "
                "-svel_ksp_type preonly -ksp_type fgmres -dim 20,20,20 "
                "-ksp_rtol 1e-10".split())
    outer = o.ksp_config("", KSPConfig(type="gmres"))
    assert outer.type == "fgmres" and outer.rtol == 1e-10
    vel = o.ksp_config("vel_", KSPConfig())
    assert vel.max_it == 4
    svel = o.ksp_config("svel_", KSPConfig())
    assert svel.type == "preonly"
    schur = o.ksp_config("schur_", KSPConfig())
    assert schur.max_it == 3
    assert o.get_int_array("dim", ()) == (20, 20, 20)


def test_unused_tracking():
    o = Options(["-used", "1", "-unused_opt", "2"])
    o.get_int("used", 0)
    assert o.unused() == ["unused_opt"]


def test_cheb_cli_runs(capsys):
    from spectral_tpu.cli.drivers import cheb_main

    rc = cheb_main(Options(["-m1", "17", "-m", "14", "-n", "13", "-p", "12", "-d", "2"]))
    assert rc == 0
    out = capsys.readouterr().out
    assert "Norm of error" in out
    errs = [float(l.split()[-1]) for l in out.splitlines() if "Norm of error" in l]
    assert all(e < 1e-6 for e in errs)


def test_poisson_cli_runs(capsys):
    from spectral_tpu.cli.drivers import poisson_main

    rc = poisson_main(Options(["-m", "12", "-n", "12", "-ksp_rtol", "1e-10"]))
    assert rc == 0
    out = capsys.readouterr().out
    err = float(out.split("Norm of error")[1].split()[0])
    assert err < 1e-8


def test_vec_print2(capsys):
    from spectral_tpu.utils.printing import vec_print2

    vec_print2(np.arange(6.0).reshape(3, 2), 3, 2, "field")
    out = capsys.readouterr().out
    assert "field" in out and out.count("\n") == 2


def test_stokes_cli_end_to_end(capsys):
    from spectral_tpu.cli.drivers import stokes_main

    rc = stokes_main(Options("-exact 2 -cont0 1 -dim 8,8 -ksp_rtol 1e-8".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "DOF distribution" in out
    assert "Reason for solver termination: CONVERGED" in out


def test_stokes_cli_fused_continuation(capsys):
    """-fused runs the one-dispatch continuation (solve_continuation_fused)
    and lands on the same final error as the host loop."""
    from spectral_tpu.cli.drivers import stokes_main

    args = "-exact 2 -rheology 1 -cont 2 -eps 1e-2 -exponent 3 -dim 8,8"
    rc = stokes_main(Options((args + " -fused").split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[fused 2/2]" in out
    err_f = float(out.split("abs = ")[1].split()[0])
    rc = stokes_main(Options(args.split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    err_h = float(out.split("abs = ")[1].split()[0])
    assert abs(err_f - err_h) <= 1e-9 + 1e-6 * abs(err_h)


def test_heat_cli(capsys):
    from spectral_tpu.cli.drivers import heat_main

    rc = heat_main(Options("-dim 12,12 -dt 0.02 -nsteps 5".split()))
    out = capsys.readouterr().out
    assert rc == 0
    err = float(out.split("decay")[1].split()[0])
    assert err < 1e-3


def test_unsteady_stokes_cli(capsys):
    from spectral_tpu.cli.drivers import unsteady_stokes_main

    rc = unsteady_stokes_main(Options("-dim 10,10 -dt 0.05 -nsteps 4".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    err = float(out.split("abs = ")[1].split()[0])
    assert err < 1e-4


def test_stokes_cli_curved_domain(capsys):
    """-map runs the full curvilinear metric path end-to-end (annulus
    sector; velocity PC auto-defaults to metric-aware MG)."""
    from spectral_tpu.cli.drivers import stokes_main

    rc = stokes_main(Options(
        "-exact 1 -dim 12,12 -map annulus:1:2 -snes_rtol 1e-7".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "curvilinear domain: -map annulus:1:2" in out
    assert "Reason for solver termination: CONVERGED" in out
    err = float(out.split("abs = ")[1].split()[0])
    assert err < 1e-5


def test_elliptic_cli_curved_domain(capsys):
    from spectral_tpu.cli.drivers import elliptic_main

    rc = elliptic_main(Options(
        "-dim 14,14 -exact 0 -gamma 1 -map bump:0.08 "
        "-ksp_rtol 1e-9 -snes_rtol 1e-9".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "curvilinear domain: -map bump:0.08" in out
    err = float(out.split("Norm of error")[1].split("abs = ")[1].split()[0])
    assert err < 1e-4


def test_poisson_cli_curved_domain(capsys):
    from spectral_tpu.cli.drivers import poisson_main

    rc = poisson_main(Options("-m 14 -n 14 -map bump:0.08 -ksp_rtol 1e-9".split()))
    out = capsys.readouterr().out
    assert rc == 0
    assert "curvilinear domain" in out
    assert float(out.split("Norm of error ")[1].split()[0]) < 1e-4


def test_poisson_cli_curved_gates_on_reason(capsys):
    """A stalled curvilinear solve must exit nonzero (round-3 advisor fix:
    the curved path previously returned 0 unconditionally)."""
    from spectral_tpu.cli.drivers import poisson_main

    # max_it 1 cannot converge at rtol 1e-9 on this map
    rc = poisson_main(Options(
        "-m 14 -n 14 -map bump:0.08 -ksp_rtol 1e-9 -ksp_max_it 1".split()))
    capsys.readouterr()
    assert rc != 0


def test_stokes_pcvel_mapping():
    """-pcvel accepts the reference ints 0-3, the new int 4 = mg, and
    string family names (round-3 advisor fix: 'mg' was unreachable)."""
    from spectral_tpu.cli.drivers import _pcvel_option

    for argv, want in ((["-pcvel", "0"], "fastdiag"), (["-pcvel", "1"], "q1fem"),
                       (["-pcvel", "2"], "probed"), (["-pcvel", "3"], "nodal"),
                       (["-pcvel", "4"], "mg"), (["-pcvel", "mg"], "mg"),
                       (["-pcvel", "q1sep"], "q1sep"), ([], "fastdiag")):
        assert _pcvel_option(Options(argv)) == want, argv


def test_stokes_cli_debug_dumps(capsys):
    """-debug 1 prints the exact-state/residual and final-error grids;
    -debug 2 adds coordinates/forcing and the Neumann/mixed node census
    (stokes.C:197-204, 807-834, 978-984)."""
    from spectral_tpu.cli.drivers import stokes_main

    rc = stokes_main(Options(
        "-exact 2 -cont0 1 -dim 6,5 -debug 2 -boundary 1 "
        "-snes_rtol 1e-4".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    for tag in ("exact global", "exact residual", "final error",
                "coordinates", "exact forcing", "boundary type NEUMANN"):
        assert tag in out, tag


def test_elliptic_grid_sequence(capsys):
    """-snes_grid_sequence k (SNESSetGridSequence parity): coarse solves
    regenerate the problem per level and warm-start the fine grid via
    spectral regrid — the fine solve finishes in ~2 Newton steps at
    machine-precision error."""
    from spectral_tpu.cli.drivers import elliptic_main

    rc = elliptic_main(Options(
        "-dim 24,24 -gamma 1 -exact 0 -ksp_rtol 1e-10 -snes_rtol 1e-10 "
        "-pc_type mg -snes_grid_sequence 1 -debug 1".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "grid sequence level (12, 12)" in out
    fine_newton = int(out.split("Number of nonlinear iterations = ")[1].split()[0])
    assert fine_newton <= 3
    err = float(out.split("Norm of error")[1].split("abs = ")[1].split()[0])
    assert err < 1e-10


def test_stokes_grid_sequence(capsys):
    """stokes -snes_grid_sequence: full continuation runs on the coarse
    grid only; the fine grid solves once at the final parameters from the
    spectrally-regridded state."""
    from spectral_tpu.cli.drivers import stokes_main

    rc = stokes_main(Options(
        "-dim 12,12 -exact 2 -rheology 1 -cont 2 -eps 1e-2 -exponent 2 "
        "-pcvel mg -snes_ksp_ew -snes_grid_sequence 1".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "grid sequence level" in out
    assert "Reason for solver termination: CONVERGED" in out


def test_elliptic_snes_type_family(capsys):
    """-snes_type (SNESSetType parity): the full SNES family drives the
    elliptic problem from the CLI.  anderson/ngmres/fas converge to
    spectral accuracy; ngmres composes a loose Newton NPC via
    -npc_snes_type (SNESSetNPC analog)."""
    from spectral_tpu.cli.drivers import elliptic_main

    base = "-dim 16,16 -gamma 1 -exact 0"
    for extra, max_its in [
        ("-snes_type newtontr", 15),
        ("-snes_type anderson", 40),
        ("-snes_type ngmres", 40),
        ("-snes_type ngmres -npc_snes_type newtonls -snes_ngmres_m 5", 20),
        ("-snes_type fas", 15),
    ]:
        rc = elliptic_main(Options(f"{base} {extra}".split()))
        out = capsys.readouterr().out
        assert rc == 0, (extra, out)
        assert "CONVERGED" in out, (extra, out)
        its = int(out.split("Number of nonlinear iterations = ")[1].split()[0])
        assert its <= max_its, (extra, its)
        err = float(out.split("Norm of error")[1].split("abs = ")[1].split()[0])
        assert err < 1e-7, (extra, err)
    # unknown type is a clear CLI error
    import pytest
    with pytest.raises(SystemExit):
        elliptic_main(Options(f"{base} -snes_type bogus".split()))


def test_convection_cli(capsys):
    """Coupled convection driver end-to-end: subcritical internal heating
    marches to the exact heated-conduction fluxes (Nu_top = 1 + H/2)."""
    from spectral_tpu.cli.drivers import convection_main

    rc = convection_main(Options(
        "-dim 10,10 -ra 100 -dt 2e-3 -heating 1.0 -steady_tol 1e-7"
        " -max_steps 1500 -chunk 100".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    nu_top = float(out.split("Nu(top) = ")[1].split()[0])
    assert abs(nu_top - 1.5) < 1e-3


def test_convection_cli_accel(capsys):
    """-accel: Anderson-accelerated steady state from the CLI."""
    from spectral_tpu.cli.drivers import convection_main

    rc = convection_main(Options(
        "-dim 10,10 -ra 3e3 -dt 2e-3 -accel -accel_m 4 -chunk 20"
        " -steady_tol 1e-4 -max_steps 1200".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    nu_top = float(out.split("Nu(top) = ")[1].split()[0])
    nu_bot = float(out.split("Nu(bottom) = ")[1].split()[0])
    assert nu_top > 1.5 and abs(nu_top - nu_bot) < 1e-2


def test_convection_cli_stability(capsys):
    """-stability: eigenanalysis diagnostics (critical Ra + growth-rate
    verdict) from the CLI."""
    from spectral_tpu.cli.drivers import convection_main

    rc = convection_main(Options("-dim 10,10 -ra 2000 -stability 2".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    ra_c = float(out.split("Ra_c = ")[1].split()[0])
    assert abs(ra_c - 8 * 3.14159265358979 ** 4) < 1e-3
    assert "UNSTABLE" in out


def test_heat_cli_ts_flags(capsys):
    """-ts_type bdf2 and -ts_adapt (the PETSc TS/TSAdapt knobs)."""
    from spectral_tpu.cli.drivers import heat_main

    rc = heat_main(Options("-dim 12,12 -dt 0.02 -nsteps 5 "
                           "-ts_type bdf2".split()))
    out = capsys.readouterr().out
    assert rc == 0
    assert float(out.split("decay")[1].split()[0]) < 1e-3

    rc = heat_main(Options("-dim 12,12 -dt 0.02 -nsteps 10 -ts_adapt "
                           "-ts_rtol 1e-5".split()))
    out = capsys.readouterr().out
    assert rc == 0
    assert "ts_adapt:" in out
    assert float(out.split("decay")[1].split()[0]) < 1e-3


def test_unsteady_stokes_cli_bdf2(capsys):
    from spectral_tpu.cli.drivers import unsteady_stokes_main

    rc = unsteady_stokes_main(Options("-dim 10,10 -dt 0.05 -nsteps 4 "
                                      "-scheme bdf2".split()))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "scheme = bdf2" in out
    assert float(out.split("abs = ")[1].split()[0]) < 1e-4
