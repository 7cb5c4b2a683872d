"""Driver implementations: output format mirrors the reference executables."""

from __future__ import annotations

import dataclasses

import numpy as np

from spectral_tpu.utils.options import Options


def _default_snes_rtol() -> float:
    import jax

    return 1e-8 if jax.config.read("jax_enable_x64") else 1e-5


def _print_unused(opts: Options) -> None:
    left = opts.unused()
    if left:
        print(f"WARNING! There are options you set that were not used: {left}")


def _snes_solve(opts: Options, model, make_model, b, dirichlet, x0, *,
                ksp, newton, pc):
    """-snes_type dispatch (PETSc SNESSetType parity): ``newtonls``
    (default), ``newtontr``, ``qn``, ``anderson``, ``ngmres``, ``fas``.

    The reference always runs SNESNEWTONLS (elliptic.C:177-186); PETSc
    exposes the full family via -snes_type, which this mirrors.  Family
    knobs use their PETSc names (-snes_qn_m, -snes_anderson_m/-beta,
    -snes_ngmres_m) plus -npc_snes_type newtonls to compose
    NGMRES(Newton-loose) with -npc_ksp_rtol / -npc_ksp_max_it controlling
    the inner loose solve (SNESSetNPC analog).  Non-Newton results are
    adapted to NewtonResult so monitors and exit codes stay uniform.
    """
    snes_type = opts.get_string("snes_type", "newtonls")
    if snes_type in ("newtonls", "newton"):
        return model.solve(b, dirichlet, x0=x0, ksp=ksp, newton=newton,
                           pc_type=pc)
    import jax.numpy as jnp

    from spectral_tpu.solvers import newton as snes
    from spectral_tpu.solvers.newton import NewtonConfig, NewtonResult

    residual = model.make_residual(b, dirichlet)
    x0 = jnp.zeros(model.grid.dims) if x0 is None else x0
    pcs, pca = model.make_pc(pc) if pc != "none" else (None, None)
    if snes_type in ("newtontr", "tr"):
        return snes.newton_tr_solve(
            residual, x0, jacobian_action=model.jacobian_action,
            pc_setup=pcs, pc_apply=pca, ksp=ksp, config=newton,
            delta0=opts.get_real("snes_tr_delta0", 0.2),
            eta1=opts.get_real("snes_tr_eta1", 1e-3),
            eta2=opts.get_real("snes_tr_eta2", 0.25),
            eta3=opts.get_real("snes_tr_eta3", 0.75))
    if snes_type == "qn":
        return snes.quasi_newton_solve(
            residual, x0, m=opts.get_int("snes_qn_m", 10),
            pc_setup=pcs, pc_apply=pca, config=newton)
    if snes_type == "anderson":
        return snes.anderson_solve(
            residual, x0, m=opts.get_int("snes_anderson_m", 5),
            beta=opts.get_real("snes_anderson_beta", 0.2),
            pc_setup=pcs, pc_apply=pca, config=newton)
    if snes_type == "ngmres":
        npc = None
        if opts.get_string("npc_snes_type", "") in ("newtonls", "newton"):
            inner_ksp = dataclasses.replace(
                ksp, rtol=opts.get_real("npc_ksp_rtol", 0.3),
                max_it=opts.get_int("npc_ksp_max_it", 5))
            inner_cfg = NewtonConfig(max_it=1, rtol=0.0, atol=0.0,
                                     line_search="basic")

            def npc(x):  # one loose inexact-Newton step per outer iteration
                return snes.newton_solve(
                    residual, x, jacobian_action=model.jacobian_action,
                    pc_setup=pcs, pc_apply=pca, ksp=inner_ksp,
                    config=inner_cfg).x
        return snes.ngmres_solve(
            residual, x0, m=opts.get_int("snes_ngmres_m", 5), npc=npc,
            beta=opts.get_real("snes_ngmres_beta", 0.2),
            pc_setup=pcs, pc_apply=pca, config=newton)
    if snes_type == "fas":
        from spectral_tpu.solvers.fas import FASSolver

        fas = FASSolver(make_model, model.grid.dims, b, dirichlet)
        r = fas.solve(x0=x0, rtol=newton.rtol, atol=newton.atol,
                      max_cycles=newton.max_it)
        return NewtonResult(x=r.x, iters=r.iters, reason=r.reason,
                            fnorm=r.rnorm, fnorm_history=r.history,
                            ksp_iters=[0] * r.iters)
    raise SystemExit(f"unknown -snes_type {snes_type!r} "
                     "(newtonls|newtontr|qn|anderson|ngmres|fas)")


def cheb_main(opts: Options) -> int:
    """Transform self-test (cheb.c:16-135): apply the 1-D and rank-3
    derivative operators to exp-type functions with known derivatives."""
    import jax.numpy as jnp

    from spectral_tpu.ops.chebyshev import cgl_nodes_np, chebdiff

    m1 = opts.get_int("m1", 5)
    m = opts.get_int("m", 8)
    n = opts.get_int("n", 7)
    p = opts.get_int("p", 1)
    d = opts.get_int("d", 0)

    x = cgl_nodes_np(m1)
    u = jnp.asarray(np.exp(x))
    if m1 >= 3:
        err = float(jnp.max(jnp.abs(chebdiff(u, 0) - jnp.asarray(np.exp(x)))))
        print(f"Norm of error {err:e}")

    dims = [m, n, p]
    xs = [cgl_nodes_np(k) if k > 1 else np.zeros(1) for k in dims]
    X = np.meshgrid(*xs, indexing="ij")
    u2 = jnp.asarray(sum(np.exp(g) for g in X))
    du2 = chebdiff(u2, axis=d)
    err2 = float(jnp.max(jnp.abs(du2 - jnp.asarray(np.exp(X[d])))))
    print(f"Norm of error {err2:e}")
    _print_unused(opts)
    return 0


def _domain_intervals(opts, ndim):
    """-domain a0,b0,a1,b1,... : per-axis physical intervals (the coordinate
    transform the reference leaves as FIXME, stokes.C:587-738)."""
    vals = opts.get_real_array("domain", ())
    if not vals:
        return None
    if len(vals) != 2 * ndim:
        raise SystemExit(f"-domain needs {2 * ndim} values (a,b per axis)")
    return tuple((vals[2 * i], vals[2 * i + 1]) for i in range(ndim))


def poisson_main(opts: Options) -> int:
    """Linear Poisson solve (poisson.c:33-175)."""
    import jax.numpy as jnp

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.solvers.krylov import KSPConfig

    m = opts.get_int("m", 8)
    n = opts.get_int("n", 7)
    p = opts.get_int("p", 1)
    dims = (m, n) if p == 1 else (m, n, p)
    map_spec = opts.get_string("map", "")
    ksp = opts.ksp_config("", KSPConfig(type="gmres", rtol=1e-7, max_it=500))
    if map_spec:
        # curved domain: CurvilinearPoisson with the manufactured solution
        # u = prod cos(pi x_j / 2) evaluated at physical nodes
        from spectral_tpu.models.curvilinear import CurvilinearPoisson
        from spectral_tpu.ops.curvilinear import named_map
        if _domain_intervals(opts, len(dims)) is not None:
            raise SystemExit("-map and -domain are mutually exclusive")
        model = CurvilinearPoisson(Grid(dims), named_map(map_spec))
        print(f"  curvilinear domain: -map {map_spec}")
        d = len(dims)
        u_fn = lambda x: jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1)
        lap_fn = lambda x: -d * (0.5 * jnp.pi) ** 2 * u_fn(x)
        u, b = model.manufactured(u_fn, lap_fn)
        res = model.solve(b, ksp=ksp, pc_type=opts.pc_type("", "mg"))
        err = float(jnp.max(jnp.abs(res.x - u)))
        print(f"Norm of error {err:e} iterations {int(res.iters)}")
        _print_unused(opts)
        # gate on the solver outcome like the flat/heat/stokes paths: a
        # stalled curvilinear solve must not exit success
        return 0 if int(res.reason) > 0 else 2
    model = PoissonModel(
        Grid(dims, intervals=_domain_intervals(opts, len(dims))))
    u, f = model.exact_solution()
    b = model.rhs(u, f)
    pc = opts.pc_type("", "fastdiag")
    res = model.solve(b, ksp=ksp, pc_type=pc)
    err = float(jnp.max(jnp.abs(res.x - u)))
    print(f"Norm of error {err:e} iterations {int(res.iters)}")
    _print_unused(opts)
    return 0


def elliptic_main(opts: Options) -> int:
    """Nonlinear elliptic driver (elliptic.C:117-246)."""
    import jax.numpy as jnp

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig
    from spectral_tpu.utils.printing import vec_print2

    dims = opts.get_int_array("dim", (8, 6))
    debug = opts.get_int("debug", 0)
    exact = opts.get_int("exact", 0)
    gamma = opts.get_real("gamma", 0.0)
    exponent = opts.get_real("exponent", 2.0)
    cos_scale = opts.get_real("cos_scale", 1.0)

    print(f"Elliptic problem  dims = [{','.join(map(str, dims))}]"
          f"    gamma = {gamma:f}    exponent = {exponent:8f}")

    map_spec = opts.get_string("map", "")
    intervals = _domain_intervals(opts, len(dims))
    if map_spec and intervals is not None:
        raise SystemExit("-map and -domain are mutually exclusive")

    def make_model(dims_l):
        if map_spec:
            from spectral_tpu.ops.curvilinear import named_map
            return EllipticModel(Grid(dims_l), gamma=gamma, exponent=exponent,
                                 phi=named_map(map_spec))
        return EllipticModel(Grid(dims_l, intervals=intervals),
                             gamma=gamma, exponent=exponent)

    model = make_model(tuple(dims))
    if map_spec:
        print(f"  curvilinear domain: -map {map_spec}")
    g = model.grid
    print(g.census())
    u, b, dirichlet = model.setup_problem(exact=exact, cos_scale=cos_scale)

    # CHECK_EXACT (elliptic.C:193-209)
    residual = model.make_residual(b, dirichlet)
    F, _ = residual(u)
    norm = float(jnp.max(jnp.abs(F)))
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.asarray(F) / np.where(np.asarray(b) != 0, np.asarray(b), np.inf)
    rnorm = float(np.nanmax(np.abs(rel)))
    print(f"{'Norm of exact residual':<25}: abs = {norm:8e}   rel = {rnorm:8e}")

    import jax
    f64 = jax.config.read("jax_enable_x64")
    ksp = opts.ksp_config("", KSPConfig(type="fgmres", rtol=1e-5, max_it=500))
    # f32 cannot reach the f64 default tolerance; scale it to the dtype floor
    newton = opts.newton_config(NewtonConfig(rtol=1e-8 if f64 else 1e-5,
                                             max_it=50))
    pc = opts.pc_type("", "mg" if map_spec else "fastdiag")
    gseq = opts.get_int("snes_grid_sequence", 0)
    x0 = None
    if gseq > 0:
        # -snes_grid_sequence k (PETSc SNESSetGridSequence parity): solve
        # the SAME problem regenerated on k successively coarser grids and
        # warm-start each finer level with the spectrally-regridded coarse
        # solution (ops.chebyshev.cheb_regrid is polynomial-exact, so the
        # fine Newton starts inside the quadratic basin; measured on 24^2:
        # 2 Newton / 31 Krylov vs 5 / 82 cold).
        from spectral_tpu.ops.chebyshev import cheb_regrid
        levels = []
        for lvl in range(gseq, 0, -1):
            dl = tuple(max(5, ((n - 1) >> lvl) + 1) for n in dims)
            # dedup: deep sequences hit the floor and would repeat a level
            # (the warm start would then carry the WRONG shape downstream)
            if dl != tuple(dims) and dl not in levels:
                levels.append(dl)
        for i, dl in enumerate(levels):
            ml = make_model(dl)
            _, bl, drl = ml.setup_problem(exact=exact, cos_scale=cos_scale)
            rl = ml.solve(bl, drl, x0=x0, ksp=ksp, newton=newton, pc_type=pc)
            print(f"  grid sequence level {dl}: {int(rl.iters)} Newton / "
                  f"{int(np.sum(np.asarray(rl.ksp_iters)))} Krylov, "
                  f"reason {rl.reason_str()}")
            nxt = levels[i + 1] if i + 1 < len(levels) else tuple(dims)
            x0 = Grid(nxt).zero_boundary(
                cheb_regrid(ml.grid.set_boundary(rl.x, drl), nxt))
    res = _snes_solve(opts, model, make_model, b, dirichlet, x0,
                      ksp=ksp, newton=newton, pc=pc)

    if debug >= 2:
        vec_print2(np.asarray(res.x)[1:-1, 1:-1], dims[0] - 2, dims[1] - 2, "computed u")
    err = res.x - u
    norm = float(jnp.max(jnp.abs(err)))
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.asarray(err) / np.where(np.asarray(u) != 0, np.asarray(u), np.inf)
    rnorm = float(np.nanmax(np.abs(rel)))
    print(f"Number of nonlinear iterations = {res.iters}")
    print(f"Reason for solver termination: {res.reason_str()}")
    print(f"{'Norm of error':<25}: abs = {norm:8e}   rel = {rnorm:8e}")
    if debug >= 1:
        print(f"KSP iterations per Newton step: {res.ksp_iters}")
    if opts.has("snes_monitor") or opts.has("rhistory"):
        for i, fn in enumerate(res.fnorm_history):
            print(f"{i:3d} SNES fnorm history {fn:.12e}")
    if opts.has("ksp_monitor"):
        for i, rn in enumerate(res.ksp_history_last):
            print(f"{i:5d} KSP Residual norm {rn:.12e}")
    if opts.has("ksp_compute_singularvalues"):
        from spectral_tpu.solvers.krylov import extreme_singular_values
        pcs, pca = model.make_pc(pc)
        Ff, lin_state = residual(res.x)
        pc_state = pcs(res.x, lin_state) if pcs else None
        smax, smin = extreme_singular_values(
            lambda w: model.jacobian_action(res.x, lin_state, w), Ff,
            M=(lambda r: pca(pc_state, r)) if pca else None)
        cond = smax / max(smin, 1e-300)
        print(f"Iteratively computed extreme singular values: "
              f"max {smax:9.6e} min {smin:9.6e} cond {cond:9.6e}")
    _print_unused(opts)
    return 0 if res.reason > 0 else 2


def _pcvel_option(opts: Options) -> str:
    """-pcvel: reference ints 0-3 (stokes.C:159-174) plus 4 = the metric/
    eta-aware multigrid family (the recommended curved-domain PC, which the
    int-only mapping previously made unreachable from the CLI); string
    values name any registered family directly."""
    raw = opts.get_string("pcvel", "0")
    table = {"0": "fastdiag", "1": "q1fem", "2": "probed", "3": "nodal",
             "4": "mg"}
    return table.get(raw, raw)


def stokes_main(opts: Options) -> int:
    """Stokes driver (stokes.C:119-253) with continuation."""
    import jax.numpy as jnp

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    dims = opts.get_int_array("dim", (8, 6))
    debug = opts.get_int("debug", 0)
    cfg = StokesConfig(
        exact=opts.get_int("exact", 0),
        boundary=opts.get_int("boundary", 0),
        rheology=opts.get_int("rheology", 0),
        hardness=opts.get_real("hardness", 1.0),
        exponent=opts.get_real("exponent", 1.0),
        regularization=opts.get_real("eps", 1.0),
        gamma0=opts.get_real("gamma0", 1.0),
        cont0=opts.get_int("cont0", 0),
        cont=opts.get_int("cont", 1),
        scaleM=opts.get_real("scaleM", 1.0),
        scaleN=opts.get_real("scaleN", 1.0),
        zeroN=opts.get_int("zeroN", 0),
        zeroV=opts.get_real("zeroV", 1.0),
        pcvel=_pcvel_option(opts),
        pcvel_smoother=opts.get_string("pcvel_smoother", "chebyshev"),
        tbc=opts.get_int("tbc", 0),
        traction_p=bool(opts.get_int("traction_p", 0)),
        mixed_tang=bool(opts.get_int("mixed_tang", 0)),
        saddle=opts.get_int("pc_saddle_type", 0),
        outer_ksp=opts.ksp_config("", KSPConfig(type="fgmres", rtol=1e-5,
                                                max_it=500, restart=50)),
        vel_ksp=opts.ksp_config("vel_", KSPConfig(type="gmres", rtol=1e-5,
                                                  max_it=10000, restart=30)),
        svel_ksp=opts.ksp_config("svel_", KSPConfig(type="gmres", rtol=1e-5,
                                                    max_it=10000, restart=30)),
        schur_ksp=opts.ksp_config("schur_", KSPConfig(type="gmres", rtol=1e-5,
                                                      max_it=10000, restart=30)),
        newton=opts.newton_config(NewtonConfig(rtol=_default_snes_rtol(),
                                               max_it=50)),
        cont_predictor=opts.get_string("cont_predictor", "none"),
    )
    print(f"Stokes problem  dim = [{','.join(map(str, dims))}]")
    print(f"  hardness = {cfg.hardness:f}    exponent = {cfg.exponent:8f}"
          f"    regularization = {cfg.regularization:8f}    gamma0 = {cfg.gamma0:8f}")

    map_spec = opts.get_string("map", "")
    if map_spec:
        # curved domain (full curvilinear metric form; the reference's
        # "FIXME: coordinate transform", stokes.C:587-738)
        from spectral_tpu.ops.curvilinear import named_map
        if _domain_intervals(opts, len(dims)) is not None:
            raise SystemExit("-map and -domain are mutually exclusive")
        if not opts.has("pcvel"):
            # metric-aware MG velocity PC is the right default on curved
            # domains (fastdiag is constant-coefficient / metric-blind)
            cfg = dataclasses.replace(cfg, pcvel="mg")
        p = StokesProblem(Grid(dims), cfg, phi=named_map(map_spec))
        print(f"  curvilinear domain: -map {map_spec}")
    else:
        p = StokesProblem(
            Grid(dims, intervals=_domain_intervals(opts, len(dims))), cfg)
    print(p.census())

    # exact residual check (stokes.C:191-205)
    residual = p.make_residual(p.params_at(cfg.cont))
    xex = p.exact_state()
    F, _ = residual(xex)
    unorm = max(float(jnp.max(jnp.abs(xex["v"]))), float(jnp.max(jnp.abs(xex["p"]))))
    fnorm = max(float(jnp.max(jnp.abs(p.force["v"]))), float(jnp.max(jnp.abs(p.force["p"]))))
    rnorm = max(float(jnp.max(jnp.abs(F["v"]))), float(jnp.max(jnp.abs(F["p"]))))
    print(f"Norm of solution {unorm:9.3e}  norm of forcing {fnorm:9.3e}"
          f"  norm of residual {rnorm:9.3e}")

    def _uvp_print2(state, name):
        """VecPrint2 of a (v, p) state's interior as the reference does
        (m-2, n-2, 'uvp') — on d > 2 grids print the axis-2 midplane."""
        from spectral_tpu.utils.printing import vec_print2
        v, pr = np.asarray(state["v"]), np.asarray(state["p"])
        if v.ndim > 3:
            mid = v.shape[2] // 2
            v, pr = v[:, :, mid], pr[:, :, mid]
        field = np.concatenate([v, pr[..., None]], axis=-1)[1:-1, 1:-1]
        comp = "uvw"[:field.shape[-1] - 1] + "p"   # d velocity labels + p
        vec_print2(field, dims[0] - 2, dims[1] - 2, name, comp)

    if debug >= 1:
        # -debug 1: exact solution + its discrete residual (stokes.C:197-204)
        _uvp_print2(xex, "exact global")
        _uvp_print2(F, "exact residual")
    if debug >= 2:
        # -debug 2: setup-stage dumps (stokes.C:978-984 coordinates/forcing;
        # stokes.C:807-834 mixed/Neumann node census)
        from spectral_tpu.utils.printing import vec_print2
        coords = np.asarray(p.cmap.coords if p.cmap is not None
                            else p.grid.coords)
        if coords.ndim > 3:
            coords = coords[:, :, coords.shape[2] // 2]
        vec_print2(coords[..., :2], dims[0], dims[1], "coordinates", "xy")
        _uvp_print2({"v": p.force["v"], "p": p.force["p"]}, "exact forcing")
        nm = np.asarray(p.nm_mask)
        if nm.any():
            normal = np.asarray(p.normal)
            for idx in np.argwhere(nm):
                t = tuple(int(i) for i in idx)
                kind = ("MIXED" if bool(np.asarray(p.mixed_mask)[t])
                        else "NEUMANN")
                print(f"boundary type {kind}, index = {t}, "
                      f"normal = {normal[t].tolist()}")

    monitor = opts.has("snes_monitor")
    ckpt_dir = opts.get_string("checkpoint_dir", "") or None
    gseq = opts.get_int("snes_grid_sequence", 0)
    from spectral_tpu.utils.profiling import PhaseTimer
    timer = PhaseTimer()
    with timer.phase("SNESSolve"):
        if gseq > 0:
            # -snes_grid_sequence k: run the FULL continuation (the
            # expensive parameter ramp, stokes.C:217-235) on a coarse grid
            # only, then solve finer grids at the FINAL parameters from
            # the spectrally-regridded state — grid sequencing composed
            # with parameter continuation (no reference analog; PETSc
            # SNESSetGridSequence pattern).
            from spectral_tpu.ops.chebyshev import cheb_regrid

            def make_p(dims_l):
                if map_spec:
                    from spectral_tpu.ops.curvilinear import named_map
                    return StokesProblem(Grid(dims_l), cfg,
                                         phi=named_map(map_spec))
                return StokesProblem(
                    Grid(dims_l, intervals=_domain_intervals(opts, len(dims))),
                    cfg)

            seq = []
            for lvl in range(gseq, 0, -1):
                dl = tuple(max(6, ((n - 1) >> lvl) + 1) for n in dims)
                if dl != tuple(dims) and dl not in seq:
                    seq.append(dl)
            x0 = None
            for i, dl in enumerate(seq):
                pl = make_p(dl)
                if x0 is None:
                    # the coarse-level continuation carries the checkpoint/
                    # resume state (the expensive ramp lives here)
                    rl = pl.solve_continuation(
                        monitor=monitor, checkpoint_dir=ckpt_dir)[-1]
                else:
                    rl = pl.solve(x0, monitor=monitor)
                nxt = seq[i + 1] if i + 1 < len(seq) else tuple(dims)
                pn = make_p(nxt) if nxt != tuple(dims) else p
                x0 = {"v": pn.mask_v(cheb_regrid(rl.x["v"], nxt)),
                      "p": pn.mask_p(cheb_regrid(rl.x["p"], nxt))}
                print(f"  grid sequence level {dl}: {int(rl.iters)} Newton / "
                      f"{int(np.sum(np.asarray(rl.ksp_iters)))} Krylov, "
                      f"reason {rl.reason_str()}")
            results = [p.solve(x0, monitor=monitor)]
        elif opts.has("fused"):
            # -fused: the ENTIRE continuation as one device dispatch
            # (solve_continuation_fused — lax.scan of fused Newton
            # while_loops over the traced parameter schedule); monitor /
            # checkpointing are host-loop features
            if ckpt_dir:
                raise SystemExit("-fused and -checkpoint_dir are mutually "
                                 "exclusive (fused runs have no host loop "
                                 "to checkpoint)")
            results = p.solve_continuation_fused()
            for i, r in enumerate(results):
                print(f"  [fused {i}/{len(results) - 1}] {int(r.iters)} "
                      f"Newton / {int(np.sum(np.asarray(r.ksp_iters)))} "
                      f"Krylov, reason {r.reason_str()}")
        else:
            results = p.solve_continuation(monitor=monitor,
                                           checkpoint_dir=ckpt_dir)
    res = results[-1]
    if monitor and res.lin_state is not None:
        # eta extremes per solve (stokes.C:730-735 prints them per residual)
        eta = res.lin_state[0]
        print(f"Minimum eta = {float(jnp.min(eta)):9.3e}   "
              f"Maximum eta = {float(jnp.max(eta)):9.3e}")
    err = p.error_vs_exact(res.x)
    if debug >= 1:
        # post-solve dump (stokes.C:224-227; the reference prints x under
        # the label "final error" — print the actual mean-free error)
        pm = np.asarray(p.p_mask)
        dp = np.where(pm, np.asarray(res.x["p"]) - np.asarray(p.exact_p), 0.0)
        dp -= np.where(pm, dp.sum() / max(pm.sum(), 1), 0.0)
        _uvp_print2({"v": np.asarray(res.x["v"]) - np.asarray(p.exact_v),
                     "p": dp}, "final error")
    print(f"Number of nonlinear iterations = {res.iters}")
    print(f"Reason for solver termination: {res.reason_str()}")
    print(f"{'Norm of error':<25}: abs = {err:8e}")

    if opts.has("ksp_monitor"):
        for i, rn in enumerate(res.ksp_history_last):
            print(f"{i:5d} KSP Residual norm {rn:.12e}")
    if opts.has("ksp_compute_singularvalues"):
        # PETSc -ksp_compute_singularvalues analog: Arnoldi/SVD condition
        # estimate of the PRECONDITIONED Jacobian at the final state —
        # quantifies the conditioning-limited curved Neumann/mixed regimes
        # the reference only describes qualitatively (README:64-68)
        from spectral_tpu.solvers.krylov import extreme_singular_values
        Ff, lin_state = residual(res.x)
        pcs, pca = p.make_pc()
        pc_state = pcs(res.x, lin_state)
        smax, smin = extreme_singular_values(
            lambda w: p.jacobian_action(res.x, lin_state, w), Ff,
            M=lambda r: pca(pc_state, r), null_project=p.null_project)
        cond = smax / max(smin, 1e-300)
        print(f"Iteratively computed extreme singular values: "
              f"max {smax:9.6e} min {smin:9.6e} cond {cond:9.6e}")
    if opts.has("output_vtk"):
        from spectral_tpu.utils.vtk import write_stokes_vtk
        write_stokes_vtk(p, res.x, "stokes.vtk")
        print("wrote stokes.vtk")
    if opts.has("log_summary"):
        print(timer.summary())
    _print_unused(opts)
    return 0 if res.reason > 0 else 2


def heat_main(opts: Options) -> int:
    """Time-dependent diffusion driver (capability extension; models/heat.py).

    spectral-tpu heat -dim 16,16 -dt 0.01 -nsteps 20 [-theta 0.5]
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.heat import HeatModel

    dims = opts.get_int_array("dim", (16, 16))
    dt = opts.get_real("dt", 0.01)
    nsteps = opts.get_int("nsteps", 20)
    theta = opts.get_real("theta", 0.5)
    map_spec = opts.get_string("map", "")
    print(f"Heat problem  dims = [{','.join(map(str, dims))}]  dt = {dt}"
          f"  theta = {theta}  steps = {nsteps}")
    if map_spec:
        # curved domain: relax toward the harmonic function x^2 - y^2 held
        # at the boundary; report the steady-state error at physical nodes
        from spectral_tpu.ops.curvilinear import named_map
        from spectral_tpu.solvers.krylov import KSPConfig
        if _domain_intervals(opts, len(dims)) is not None:
            raise SystemExit("-map and -domain are mutually exclusive")
        g = Grid(dims)
        m = HeatModel(g, dt=dt, theta=theta, phi=named_map(map_spec),
                      ksp=KSPConfig(type="gmres", rtol=1e-11, max_it=200))
        print(f"  curvilinear domain: -map {map_spec}")
        xp = m.cmap.coords
        harm = jnp.asarray(xp[..., 0] ** 2 - xp[..., 1] ** 2)
        dirichlet = jnp.where(g.boundary_mask, harm, 0.0)
        z = jnp.zeros(g.dims)
        u = jax.jit(lambda v: m.rollout(v, z, dirichlet, nsteps))(z)
        err = float(np.max(np.abs(np.asarray(g.zero_boundary(u - harm)))))
        print(f"Norm of error vs analytic decay {err:e} (harmonic steady state)")
        _print_unused(opts)
        return 0 if err < 1.0 else 2
    ts_type = opts.get_string("ts_type", "theta")
    ts_adapt = opts.get_bool("ts_adapt", False)
    g = Grid(dims, intervals=_domain_intervals(opts, len(dims)))
    m = HeatModel(g, dt=dt, theta=theta)
    u0 = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * g.coords), axis=-1))
    z = jnp.zeros(g.dims)
    T_end = dt * nsteps
    if ts_adapt:
        # adaptive variable-step BDF2 over the same horizon (TSAdapt role):
        # -ts_rtol/-ts_atol/-ts_dt0/-ts_max_steps, PETSc-style names
        from spectral_tpu.solvers.ts import TSConfig, integrate_adaptive
        cfg = TSConfig(rtol=opts.get_real("ts_rtol", 1e-5),
                       atol=opts.get_real("ts_atol", 1e-9),
                       dt0=opts.get_real("ts_dt0", dt),
                       max_steps=opts.get_int("ts_max_steps", 10_000),
                       monitor=opts.get_bool("ts_monitor", False))
        u, info = integrate_adaptive(m, u0, 0.0, T_end, z, z, cfg)
        print(f"  ts_adapt: {info['steps']} accepted steps, "
              f"{info['rejects']} rejected, dt "
              f"{min(info['dts']):.3g} .. {max(info['dts']):.3g}")
    elif ts_type == "bdf2":
        from spectral_tpu.solvers.ts import rollout_bdf2
        u = jax.jit(lambda v: rollout_bdf2(m, v, z, z, dt, nsteps))(u0)
    elif ts_type == "theta":
        u = jax.jit(lambda v: m.rollout(v, z, z, nsteps))(u0)
    else:
        raise SystemExit(f"unknown -ts_type {ts_type!r} (theta|bdf2)")
    lam = g.ndim * (0.5 * np.pi) ** 2
    exact = np.asarray(u0) * np.exp(-lam * T_end)
    err = float(np.max(np.abs(np.asarray(u) - exact)))
    print(f"Norm of error vs analytic decay {err:e}")
    _print_unused(opts)
    return 0 if err < 1.0 else 2


def unsteady_stokes_main(opts: Options) -> int:
    """Time-dependent Stokes driver (capability extension; no reference
    analog — the reference is steady-only):

    spectral-tpu ustokes -dim 12,12 -dt 0.05 -nsteps 10 [-theta 0.5]
        [-omega 1.0] [-exact 1] [-pcvel fastdiag|mg] [-map bump:0.05]

    Integrates the manufactured solution u0(x) cos(omega t) (u0 = the
    steady exact solution) and reports the end-time error, which is pure
    time-integration error of the theta scheme.
    """
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig
    from spectral_tpu.models.stokes_unsteady import UnsteadyStokes
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    dims = opts.get_int_array("dim", (12, 12))
    dt = opts.get_real("dt", 0.05)
    nsteps = opts.get_int("nsteps", 10)
    if nsteps < 1:
        raise SystemExit("-nsteps must be >= 1")
    theta = opts.get_real("theta", 0.5)
    omega = opts.get_real("omega", 1.0)
    map_spec = opts.get_string("map", "")
    phi = None
    if map_spec:
        from spectral_tpu.ops.curvilinear import named_map
        phi = named_map(map_spec)
    cfg = StokesConfig(
        exact=opts.get_int("exact", 1), boundary=0,
        rheology=opts.get_int("rheology", 0),
        hardness=opts.get_real("hardness", 1.0),
        exponent=opts.get_real("exponent", 1.0),
        regularization=opts.get_real("eps", 1.0),
        gamma0=opts.get_real("gamma0", 1.0),
        pcvel=opts.get_string("pcvel", "mg" if map_spec else "fastdiag"),
        # -saddle_pc dense|dense-device: exact factored inverse of the
        # fixed mass-shifted step operator (one MXU matmul per apply)
        saddle_pc=opts.get_string("saddle_pc", "schur"),
        outer_ksp=opts.ksp_config("", KSPConfig(type="fgmres", rtol=1e-9,
                                                max_it=400, restart=100)),
        newton=opts.newton_config(NewtonConfig(rtol=_default_snes_rtol(),
                                               max_it=25)))
    scheme = opts.get_string("scheme", "theta")
    print(f"Unsteady Stokes  dim = [{','.join(map(str, dims))}]  dt = {dt}"
          f"  scheme = {scheme}" + ("" if scheme == "bdf2"
                                    else f"  theta = {theta}")
          + f"  omega = {omega}  steps = {nsteps}"
          + (f"  map = {map_spec}" if map_spec else ""))
    m = UnsteadyStokes(Grid(dims), cfg, dt=dt, theta=theta, phi=phi,
                       scheme=scheme)
    print(m.problem.census())
    u0, s_of_t, f_of_t, u_of_t, _ = m.manufactured(omega=omega)
    times = np.arange(nsteps + 1) * dt
    if m._linear and not opts.has("no_scan") and scheme == "bdf2" \
            and nsteps >= 2:
        ss = jnp.asarray([s_of_t(t) for t in times[1:]])
        f1s = jnp.stack([f_of_t(t) for t in times[2:]])
        fbar0 = 0.5 * f_of_t(times[1]) + 0.5 * f_of_t(times[0])
        v, pres, its = m.rollout_scan_bdf2(u0, ss, f1s, fbar0)
        its = [int(i) for i in np.asarray(its)]
    elif m._linear and not opts.has("no_scan") and scheme == "theta":
        # linear fast path: the whole integration is ONE lax.scan dispatch
        ss = jnp.asarray([s_of_t(t) for t in times[1:]])
        fbars = jnp.stack([theta * f_of_t(t1) + (1.0 - theta) * f_of_t(t0)
                           for t0, t1 in zip(times[:-1], times[1:])])
        v, pres, its = m.rollout_scan(u0, ss, fbars)
        its = [int(i) for i in np.asarray(its)]
    else:
        v, pres, its = m.rollout(u0, times, s_of_t, f_of_t)
    err = float(jnp.max(jnp.abs(v - u_of_t(times[-1]))))
    print(f"Outer iterations per step: min {min(its)}  max {max(its)}")
    print(f"Norm of error            : abs = {err:e} (time-integration)")
    if opts.has("output_vtk"):
        from spectral_tpu.utils.vtk import write_stokes_vtk
        write_stokes_vtk(m.problem,
                         {"v": m.problem.mask_v(v), "p": pres},
                         "ustokes.vtk", bc_scale=s_of_t(times[-1]))
        print("Wrote ustokes.vtk")
    _print_unused(opts)
    return 0 if np.isfinite(err) and err < 1e-2 else 2


def convection_main(opts: Options) -> int:
    """Coupled Boussinesq convection driver (capability extension;
    models/convection.py): infinite-Prandtl Rayleigh-Benard on the unit
    box, marched to steady state with Nusselt/Vrms diagnostics.

    spectral-tpu convection -dim 16,16 -ra 1e4 -dt 5e-4 \
        -bc freeslip -sides insulated -steady_tol 1e-3
    (the Blankenbach case 1a configuration; published Nu = 4.884409,
    Vrms = 42.864947)
    """
    import jax.numpy as jnp

    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig

    dims = opts.get_int_array("dim", (16, 16))
    cfg = ConvectionConfig(
        Ra=opts.get_real("ra", 1e4),
        dt=opts.get_real("dt", 5e-4),
        theta=opts.get_real("theta", 0.5),
        velocity_bc=opts.get_string("bc", "freeslip"),
        side_bc=opts.get_string("sides", "insulated"),
        eta_contrast=opts.get_real("eta_contrast", 1.0),
        heating=opts.get_real("heating", 0.0),
        tbc=(opts.get_int("tbc", 0) if opts.has("tbc") else None),
        pcvel=opts.get_string("pcvel", "fastdiag"),
        # -stokes_pc dense: exact factored inverse of the frozen
        # isoviscous saddle operator, one MXU matmul per PC apply
        # (models/stokes.py make_dense_pc — the -pc_type lu role)
        stokes_pc=opts.get_string("stokes_pc", "nested"),
        # -dealias 1 = the 3/2 rule; -dealias 2.0 etc. = explicit ratio
        dealias=(False if not opts.has("dealias")
                 else (lambda r: True if r in (0.0, 1.0) else r)(
                     opts.get_real("dealias", 1.0))),
        stokes_ksp=opts.ksp_config("", KSPConfig(type="fgmres", rtol=1e-7,
                                                 max_it=150, restart=60)))
    aspect = opts.get_real("aspect", 1.0)
    m = ConvectionModel.box(dims, cfg, aspect=aspect)
    print(f"Convection  dim = [{','.join(map(str, dims))}]  Ra = {cfg.Ra}"
          f"  dt = {cfg.dt}  theta = {cfg.theta}  bc = {cfg.velocity_bc}"
          f"/{cfg.side_bc}  aspect = {aspect}")
    print(m.stokes.census())
    if opts.has("stability"):
        # linear stability analysis (solvers/eig): -stability 1 = critical
        # Rayleigh number (direct generalized eigenproblem); -stability 2 =
        # also the growth rates nearest 0 at the configured Ra
        # (shift-invert; with heating + conducting sidewalls the base has
        # no conduction branch, so Ra_c is skipped and the linearization is
        # about the auto-computed 2-D steady base); -stability 3 = growth
        # rates about the steady CONVECTING state (steady_newton base)
        level = opts.get_int("stability", 1)
        ok = True
        has_conduction_branch = m._conduction_base_is_equilibrium
        if has_conduction_branch:
            ra_c, resc = m.critical_rayleigh(
                k=2, m=opts.get_int("eps_ncv", 20),
                tol=opts.get_real("eps_tol", 1e-9))
            print(f"Critical Rayleigh number Ra_c = {ra_c:.6f}  "
                  f"(converged: {resc.converged}, {resc.matvecs} operator "
                  f"applications)   Ra/Ra_c = {cfg.Ra / ra_c:.4f}")
            ok = resc.converged and np.isfinite(ra_c)
        else:
            print("No conduction branch (internal heating + conducting "
                  "sidewalls drive a base flow at every Ra): growth rates "
                  "are computed about the steady base state")
        if level >= 2 or not has_conduction_branch:
            base = None
            if level >= 3:
                from spectral_tpu.solvers.newton import NewtonConfig
                Tb, xb, binfo = m.steady_newton(
                    m.conductive_state(amp=opts.get_real("amp", 0.05)),
                    warmup=opts.get_int("warmup", 150),
                    newton=NewtonConfig(rtol=1e-9, max_it=20, ksp_ew=True))
                print(f"Steady base: Nu = {binfo['nu_top']:.6f}  "
                      f"converged: {binfo['converged']}")
                ok = ok and binfo["converged"]
                base = (Tb, xb)
            res = m.stability_eigenvalues(
                k=opts.get_int("eps_nev", 3),
                m=opts.get_int("eps_ncv", 20),
                tol=opts.get_real("eps_tol", 1e-7), base=base)
            lams = ", ".join(f"{z.real:+.6f}{z.imag:+.2e}j"
                             for z in res.eigenvalues)
            about = ("steady convecting state" if level >= 3
                     else ("steady base state" if not has_conduction_branch
                           else "conduction state"))
            print(f"Growth rates nearest 0 at Ra = {cfg.Ra} "
                  f"(about the {about}): [{lams}]  "
                  f"(converged: {res.converged})")
            verdict = ("UNSTABLE"
                       if max(z.real for z in res.eigenvalues) > 0
                       else "stable")
            print(f"The {about} is {verdict}")
            ok = ok and res.converged
        _print_unused(opts)
        return 0 if ok else 2
    T0 = m.conductive_state(amp=opts.get_real("amp", 0.05))
    nsteps = opts.get_int("nsteps", 0)
    if nsteps:
        T, _, x = m.rollout(T0, nsteps)
        info = {"steps": nsteps, "nu_top": float(m.nusselt_top(T)),
                "nu_bottom": float(m.nusselt_bottom(T)),
                "vrms": float(m.vrms(x)), "converged": True}
    elif opts.has("newton"):
        # direct Newton-Krylov steady state (steady_newton: exact coupled
        # Jacobian, one Stokes solve per Krylov iteration)
        from spectral_tpu.solvers.newton import NewtonConfig
        T, x, info = m.steady_newton(
            T0, warmup=opts.get_int("warmup", 150),
            newton=NewtonConfig(rtol=opts.get_real("snes_rtol", 1e-9),
                                max_it=opts.get_int("snes_max_it", 20),
                                ksp_ew=True, monitor=opts.has("monitor")))
        print(f"Newton: {int(info['newton'].iters)} steps, Krylov "
              f"{[int(i) for i in np.asarray(info['newton'].ksp_iters)]}, "
              f"|R| = {info['rate']:.3e}")
    elif opts.has("accel"):
        # Anderson acceleration over the chunked time stepper (AA(m) with
        # the stepper as nonlinear preconditioner, steady_accelerated)
        T, x, info = m.steady_accelerated(
            T0, m=opts.get_int("accel_m", 5),
            chunk=opts.get_int("chunk", 10),
            tol=opts.get_real("steady_tol", 1e-3),
            max_iters=opts.get_int("max_steps", 3000) //
            max(opts.get_int("chunk", 10), 1),
            warmup=opts.get_int("warmup", 100),
            monitor=opts.has("monitor"))
    elif opts.has("ts_adapt"):
        # variable-step marching (error controller + ringing detector):
        # discovers the usable dt from any conservative start
        T, x, info = m.march_adaptive(
            T0, max_steps=opts.get_int("max_steps", 3000),
            tol=opts.get_real("steady_tol", 1e-3),
            rtol=opts.get_real("ts_rtol", 3e-3),
            dt0=opts.get_real("ts_dt0", cfg.dt),
            monitor=opts.has("monitor"))
        print(f"  ts_adapt: {info['steps']} accepted / "
              f"{info['rejects']} rejected, dt {min(info['dts']):.3g}"
              f" .. {max(info['dts']):.3g}")
    else:
        T, x, info = m.march_to_steady(
            T0, max_steps=opts.get_int("max_steps", 3000),
            tol=opts.get_real("steady_tol", 1e-3),
            chunk=opts.get_int("chunk", 50),
            monitor=opts.has("monitor"))
    print(f"Steps: {info['steps']}   converged: {info['converged']}")
    print(f"Nu(top) = {info['nu_top']:.6f}   Nu(bottom) = "
          f"{info['nu_bottom']:.6f}   Nu(volume) = "
          f"{float(m.nusselt_volume(T, x)):.6f}")
    print(f"Vrms = {info['vrms']:.6f}")
    if opts.has("output_vtk"):
        from spectral_tpu.utils.vtk import write_stokes_vtk
        write_stokes_vtk(m.stokes, {"v": x["v"], "p": x["p"]},
                         "convection.vtk",
                         extra_scalars={"temperature": jnp.asarray(T)})
        print("Wrote convection.vtk")
    _print_unused(opts)
    return 0 if info["converged"] and jnp.isfinite(info["nu_top"]) else 2
