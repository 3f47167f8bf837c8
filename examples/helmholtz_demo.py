#!/usr/bin/env python
"""Damped-Helmholtz demo: complex sketched RB, SCM-certified bounds,
complex state estimation.

The non-coercive, complex-coefficient counterpart of
``sketched_rb_demo.py`` — everything the thermal-block pipeline does,
across acoustic resonances:

1. weak greedy with the complex-Omega sketched minres reductor
   (estimator-driven selection; true error tracked for the plot);
2. the certified error bound: sketched residual / beta_LB(mu) with the
   LP-based successive constraint method (mor/scm.py);
3. PBDW and dictionary recovery of complex states from 30 pointwise
   observations (the reference's inverse_problems/example.py scenario,
   on a family its thermal-block demo cannot express).

Writes ``helmholtz_demo.png``. Run: python examples/helmholtz_demo.py --cpu
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

# categorical slots 1-3 of the validated reference palette (dataviz
# skill, references/palette.md), fixed order; text stays in ink tokens
C1, C2, C3 = "#2a78d6", "#eb6834", "#1baf7a"
INK, INK2 = "#0b0b0b", "#52514e"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid", type=int, default=16)
    ap.add_argument("--extensions", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rla4mor_tpu.core.orthonormalize import gram_schmidt
    from rla4mor_tpu.models import helmholtz_fom
    from rla4mor_tpu.mor import ScmInfSup, SketchedReductor, inf_sup_error_bound
    from rla4mor_tpu.ops import GaussianEmbedding

    fom = helmholtz_fom(num_intervals=args.grid,
                        wavenumber_range=(2.0, 8.0), damping=0.5)
    Ru = fom.h1_0_product
    n = fom.solution_dim
    print(f"FOM: {fom.name}, n = {n} (complex coefficient -k^2 + 0.5ik)")

    theta = GaussianEmbedding.make(n, sqrt_product=Ru.sqrt, range_dim=220,
                                   seed=2, complex_dtype=True)
    phi = GaussianEmbedding.make(220, range_dim=120, seed=33)
    red = SketchedReductor(fom, embedding_primal=theta,
                           embedding_online=phi, product=Ru,
                           orthonormalize=True, projection="minres",
                           log_level=30)

    train = [{"wavenumber": jnp.asarray([w])}
             for w in np.linspace(2.0, 8.0, 40)]
    test = fom.parameter_space.sample_randomly(12, key=8)
    u_test = np.asarray(fom.solve_many(test))
    nrm_test = np.asarray(Ru.norm(jnp.asarray(u_test)))

    # -- 1. weak greedy: estimator-driven, true error tracked ------------
    t0 = time.perf_counter()
    hist_r, hist_err, hist_est = [], [], []
    rom_mid = rb_mid = None  # the r=5 ROM, kept for the bound panel
    picked = {0}
    red.extend_basis(jnp.asarray(fom.solve(train[0])).reshape(-1, 1))
    for it in range(1, args.extensions + 1):
        rom = red.reduce(seed=100 + it)
        if red.basis_size <= 5:  # last r <= 5 ROM wins (never None)
            rom_mid, rb_mid = rom, np.asarray(red.rb).copy()
        ests = np.array([float(np.asarray(rom.estimate_error(mu)))
                         for mu in train])
        u_r = np.asarray(red.rb) @ np.stack(
            [np.asarray(rom.solve(mu)) for mu in test], axis=1)
        rel = np.asarray(Ru.norm(jnp.asarray(u_test - u_r))) / nrm_test
        hist_r.append(red.basis_size)
        hist_err.append(float(np.median(rel)))
        hist_est.append(float(np.median(
            [float(np.asarray(rom.estimate_error(mu))) for mu in test])))
        for j in np.argsort(-ests):  # next un-picked worst parameter
            if j not in picked:
                picked.add(int(j))
                red.extend_basis(
                    jnp.asarray(fom.solve(train[j])).reshape(-1, 1))
                break
    print(f"greedy: r = {red.basis_size}, median rel err {hist_err[-1]:.2e} "
          f"({time.perf_counter() - t0:.1f}s)")

    # -- 2. SCM-certified bounds over the wavenumber sweep ---------------
    t0 = time.perf_counter()
    scm = ScmInfSup(fom, product=Ru)
    fit = scm.fit(train, tol=0.2, max_anchors=len(train))
    print(f"SCM: {fit['n_anchors']} anchors, final gap "
          f"{fit['max_gap'][-1]:.3f} ({time.perf_counter() - t0:.1f}s)")
    # the r=5 ROM: errors well above roundoff, so bound >= error is
    # visible (the converged r=11 ROM sits at the 1e-15 noise floor)
    ws = np.linspace(2.0, 8.0, 41)
    sweep_err, sweep_bnd, sweep_est = [], [], []
    for w in ws:
        mu = {"wavenumber": jnp.asarray([w])}
        u_r = rom_mid.solve(mu)
        u_t = np.asarray(fom.solve(mu))
        err = float(Ru.norm(jnp.asarray(u_t) - jnp.asarray(rb_mid) @ u_r))
        est = float(np.asarray(rom_mid.estimate_error(mu)))
        bnd = float(np.asarray(
            inf_sup_error_bound(rom_mid, mu, scm, u_r=u_r)))
        sweep_err.append(err), sweep_est.append(est), sweep_bnd.append(bnd)

    # -- 3. complex state estimation from pointwise observations ---------
    from rla4mor_tpu.estim import DicRecoveryMap, PbdwRecoveryMap

    rngl = np.random.RandomState(7)
    m_obs = min(30, n)  # tiny --grid values have < 30 interior DoF
    rows = rngl.choice(n, size=m_obs, replace=False)
    Wd = np.zeros((n, m_obs))
    Wd[rows, np.arange(m_obs)] = 1.0
    W = gram_schmidt(jnp.asarray(np.asarray(Ru.inv.apply(jnp.asarray(Wd)))),
                     product=Ru)
    mus_bg = fom.parameter_space.sample_randomly(8, key=1)
    V = gram_schmidt(fom.solve_many(mus_bg), product=Ru)
    pbdw = PbdwRecoveryMap(V, W, product=Ru, log_level=30)

    from rla4mor_tpu.core import ChainOp, compose, materialize, project
    from rla4mor_tpu.estim import ResidualDistanceDiscrete

    mus_dic = [{"wavenumber": jnp.asarray([w])}
               for w in np.linspace(2, 8, 24)]
    u_dic = fom.solve_many(mus_dic)
    V_dic = np.asarray(u_dic) / np.asarray(Ru.norm(u_dic))[None, :]
    # manifold distance: sketched parametric residual on the dic+W basis
    S = GaussianEmbedding.make(n, sqrt_product=Ru.sqrt, range_dim=96,
                               seed=11, complex_dtype=True)
    chain = ChainOp((S, Ru.inv))
    X = jnp.concatenate([jnp.asarray(V_dic), W], axis=1)
    mdist = ResidualDistanceDiscrete(
        project(compose(chain, fom.operator), None, X),
        materialize(compose(chain, fom.rhs)), mus_dic,
    )
    dic = DicRecoveryMap(jnp.asarray(V_dic), W, product=Ru,
                         manifold_distance=mdist, log_level=30)

    ws_est = np.linspace(2.2, 7.8, 9)
    rel_pbdw, rel_dic = [], []
    for w in ws_est:
        mu = {"wavenumber": jnp.asarray([w])}
        u_t = jnp.asarray(fom.solve(mu))
        w_obs = Ru.inner(W, u_t).reshape(-1, 1)
        nt = float(Ru.norm(u_t))
        rel_pbdw.append(
            float(Ru.norm(u_t - jnp.asarray(pbdw.solve(w_obs[:, 0])))) / nt)
        rel_dic.append(
            float(Ru.norm(u_t - jnp.asarray(dic.solve(w_obs))[:, 0])) / nt)
    print(f"recovery: median rel err PBDW {np.median(rel_pbdw):.2e}, "
          f"dictionary {np.median(rel_dic):.2e}")

    # -- plot -------------------------------------------------------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.8), facecolor="#fcfcfb")
    for ax in axes:
        ax.set_facecolor("#fcfcfb")
        ax.grid(True, color="#e4e3df", linewidth=0.6)
        ax.tick_params(colors=INK2, labelsize=8)
        for s in ax.spines.values():
            s.set_color("#e4e3df")

    ax = axes[0]
    ax.semilogy(hist_r, hist_err, color=C1, lw=2, marker="o", ms=4,
                label="median true rel. error")
    ax.semilogy(hist_r, hist_est, color=C2, lw=2, marker="o", ms=4,
                label="median sketched estimate")
    ax.set_xlabel("basis size r", color=INK2)
    ax.set_title("complex sketched minres greedy", color=INK, fontsize=10)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2)

    ax = axes[1]
    sweep_bnd = np.where(np.isfinite(sweep_bnd), sweep_bnd, np.nan)
    ax.semilogy(ws, sweep_bnd, color=C2, lw=2, label="certified bound (SCM)")
    ax.semilogy(ws, sweep_est, color=C3, lw=2, label="residual indicator")
    ax.semilogy(ws, sweep_err, color=C1, lw=2, label="true error")
    ax.set_xlabel("wavenumber k", color=INK2)
    ax.set_title("certified error bound across resonances", color=INK,
                 fontsize=10)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2)

    ax = axes[2]
    ax.semilogy(ws_est, rel_pbdw, color=C1, lw=2, marker="o", ms=4,
                label="PBDW (r=8 background)")
    ax.semilogy(ws_est, rel_dic, color=C2, lw=2, marker="o", ms=4,
                label="dictionary + LARS")
    ax.set_xlabel("wavenumber k", color=INK2)
    ax.set_title("complex state recovery (30 point obs.)", color=INK,
                 fontsize=10)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2)

    fig.tight_layout()
    out = Path(__file__).with_name("helmholtz_demo.png")
    fig.savefig(out, dpi=140)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
