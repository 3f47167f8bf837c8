#!/usr/bin/env python
"""TPU perf rows for the nonlinear-in-state tier (PERF.md round-4).

Pod-scale evidence that the semilinear machinery keeps the linear
families' compute pattern (the module's design claim,
models/semilinear.py docstring). One JSON line per row:

* ``semilinear_newton_4p2m``: one jitted Newton-CG FOM solve at
  2049^2 = 4.2M nodes (matrix-free SPD Jacobian, V-cycle-preconditioned
  inner CG — f32 Jacobi stagnates at ~2e-2 relative here) —
  steady-state wall-clock, second call with a fresh parameter;
* ``semilinear_offline_4p2m``: POD-DEIM fit from 4 snapshots with the
  SRHT-sketched residual compression (the pod-scale offline path:
  every n-sized residual column is compressed to k rows once);
* ``semilinear_online``: hyperreduced ``solve_and_estimate_batch``
  throughput at batch 4096 — per sample one dense (r, r) Newton (DEIM
  point evaluations only) PLUS the certified residual norm.

Methodology follows benchmarks/apps_tpu.py: time the SECOND call of
each program shape; wall time includes the device->host transfer (the
only reliable sync on the axon tunnel).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp
import numpy as np


def row(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 3),
                      "unit": unit, **extra}), flush=True)


def main():
    from rla4mor_tpu.models.semilinear import SemilinearStencilFOM
    from rla4mor_tpu.mor.semilinear_reductor import SemilinearReductor
    from rla4mor_tpu.mor.uq import sample_mu_batched
    from rla4mor_tpu.ops.embeddings import SrhtEmbedding

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    num_intervals = 2048  # power of two for MG; 2049^2 nodes = 4.2M DoF
    fom = SemilinearStencilFOM((2, 2), num_intervals, dtype=jnp.float32,
                               reaction_scale=100.0)
    mus = fom.sample_parameters(6, key=0)
    # f32 Jacobi-CG STAGNATES at ~eps_f32 * kappa ~ 2e-2 relative at this
    # size (measured; raising cg_maxiter 800 -> 6000 did not move it) —
    # the V-cycle preconditioner is what makes a CONVERGED f32 Newton
    # possible at pod scale
    kw = dict(newton_tol=1e-6, cg_tol=1e-6, cg_maxiter=200,
              cg_precond="mg")

    # --- FOM Newton solve ---------------------------------------------------
    u, it = fom.solve_newton(mus[0], return_iters=True, **kw)  # compile
    np.asarray(u[0, 0])
    t0 = time.perf_counter()
    u, it = fom.solve_newton(mus[1], return_iters=True, **kw)
    np.asarray(u[0, 0])
    dt_newton = time.perf_counter() - t0
    n_newton = int(np.asarray(it))
    res = float(jnp.linalg.norm(fom.residual(mus[1], u))
                / jnp.linalg.norm(fom.rhs()))
    # the f32 rel_residual saturates at the EVALUATION noise floor
    # ~eps_f32 * kappa(A) (~2e-2 at 4.2M DoF) no matter how converged the
    # solve is — re-evaluate the SAME f32 iterate with a scoped-x64 f64
    # stencil apply (apply() follows u's dtype, models/stencil.py:212-215)
    # for the honest convergence number
    with jax.enable_x64(True):
        mu64 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x),
                                                  jnp.float64), mus[1])
        u64 = jnp.asarray(np.asarray(u), jnp.float64)
        res64 = float(np.asarray(
            jnp.linalg.norm(fom.residual(mu64, u64))
            / jnp.linalg.norm(fom.rhs(jnp.float64))))
    row("semilinear_newton_4p2m", dt_newton, "s",
        n_dof=fom.n_dof, n_newton=n_newton, rel_residual=res,
        rel_residual_f64=res64)

    # --- offline fit (sketched path) ----------------------------------------
    S = jnp.stack([fom.solve_newton(m, **kw).reshape(-1)
                   for m in mus[:4]], axis=1)
    np.asarray(S[0, 0])
    emb = SrhtEmbedding.make(fom.n_dof, range_dim=256, seed=7)
    red = SemilinearReductor(fom, embedding=emb)
    rom = red.fit(None, snapshots=S, pod_rtol=1e-8, deim_rtol=1e-8,
                  n_reserve=1)                   # compile pass
    t0 = time.perf_counter()
    rom = red.fit(None, snapshots=S, pod_rtol=1e-8, deim_rtol=1e-8,
                  n_reserve=1)
    # sync on EVERY device leaf of the ROM (advisor r4: rhs_hat alone is
    # enqueued before the DEIM pieces and the dominant SRHT residual
    # sketch). On the axon tunnel jax.block_until_ready does NOT
    # synchronize — a device->host transfer is the only reliable sync —
    # and every ROM leaf is reduced-size, so full transfers are cheap.
    for x in jax.tree.leaves(rom):
        if isinstance(x, jax.Array):
            np.asarray(x)
    dt_fit = time.perf_counter() - t0
    row("semilinear_offline_4p2m", dt_fit, "s",
        r=int(rom.dim), m_deim=int(rom.Pv.shape[0]), k_sketch=256)

    # --- hyperreduced online batch -------------------------------------------
    batch = 4096
    mub = sample_mu_batched(fom.parameter_space, batch, key=3)
    mub = jax.tree.map(lambda x: x.astype(jnp.float32), mub)
    solve_b = jax.jit(rom.solve_and_estimate_batch)
    a, eta = solve_b(mub)
    np.asarray(eta)
    mub2 = sample_mu_batched(fom.parameter_space, batch, key=4)
    mub2 = jax.tree.map(lambda x: x.astype(jnp.float32), mub2)
    t0 = time.perf_counter()
    a, eta = solve_b(mub2)
    eta_h = np.asarray(eta)
    dt_online = time.perf_counter() - t0
    assert np.all(np.isfinite(eta_h))
    row("semilinear_online", batch / dt_online, "samples/s",
        batch=batch, r=int(rom.dim), wall_s=round(dt_online, 3))


if __name__ == "__main__":
    main()
