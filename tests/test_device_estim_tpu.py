"""TPU-gated end-to-end inverse-problems tests (VERDICT r2 item 3).

The device estim stack (LARS homotopy, batched dictionary recovery, PBDW)
runs in f32 on the chip and must match the host f64 numpy oracles to
<= 1e-4 — this is exactly what the round-3 ``Precision.HIGHEST``
hardening buys: at the TPU default (f32 truncated to bf16, ~2e-3) the
homotopy's 1e-9-scaled breakpoint comparisons select wrong variables.

Run on the TPU host:
    RLA4MOR_TPU_TESTS=1 python -m pytest tests/test_device_estim_tpu.py -q
(the env var makes conftest leave the live backend alone; the CPU suite
skips this file).
"""

import os

import numpy as np
import pytest

if os.environ.get("RLA4MOR_TPU_TESTS") != "1":
    pytest.skip(
        "device-estim tests need the real TPU backend; set "
        "RLA4MOR_TPU_TESTS=1 on a TPU host to run",
        allow_module_level=True,
    )

import jax
import jax.numpy as jnp

from rla4mor_tpu.core import AffineDense, ProjectionCoefficient
from rla4mor_tpu.estim import (
    DicRecoveryMap,
    PbdwRecoveryMap,
    ResidualDistanceDiscrete,
    lars_lasso_jax,
    lars_lasso_path_np,
)


def _problem(seed=0):
    """Synthetic dictionary-recovery problem, built in f64 on host."""
    rng = np.random.RandomState(seed)
    # m > nv so the PBDW saddle system is well-posed (CG^T CG full rank)
    n, nv, m, k, T, P = 300, 16, 24, 48, 3, 3
    W, _ = np.linalg.qr(rng.normal(size=(n, m)))        # l2-orthonormal
    V = rng.normal(size=(n, nv))
    V /= np.linalg.norm(V, axis=0)[None, :]
    lhs = rng.normal(size=(T, k, nv + m))
    rhs = rng.normal(size=(T, k, 1))
    coeffs = tuple(ProjectionCoefficient("diffusion", i) for i in range(P))
    mus = [{"diffusion": rng.uniform(0.2, 1.0, size=P)} for _ in range(10)]
    # observations of states near the dictionary span
    s_true = rng.normal(size=(nv, 4)) * (rng.uniform(size=(nv, 4)) < 0.3)
    u_true = V @ s_true + 0.01 * rng.normal(size=(n, 4))
    w = W.T @ u_true
    return dict(W=W, V=V, lhs=lhs, rhs=rhs, coeffs=coeffs, mus=mus, w=w)


def _oracle_recovery(p, max_steps, scale, ols):
    """Host f64 oracle of the batched device program: numpy LARS path,
    l2 corrections, discrete manifold distance, argmin selection."""
    from rla4mor_tpu.estim.lars import lars_weighted_path

    CG = p["W"].T @ p["V"]
    T = p["lhs"].shape[0]
    sols = []
    for j in range(p["w"].shape[1]):
        w = p["w"][:, j]
        v, _ = lars_weighted_path(CG, w, scale=scale, ols=ols,
                                  max_steps=None)
        v = v[:, :max_steps]
        eta = w[:, None] - CG @ v  # identity gramian
        coefs = np.concatenate([v, eta], axis=0)
        dists = []
        for i in range(coefs.shape[1]):
            per_mu = []
            for mu in p["mus"]:
                th = np.asarray(mu["diffusion"])[:T]
                L = np.einsum("t,tkm->km", th, p["lhs"])
                b = np.einsum("t,tkm->km", th, p["rhs"])[:, 0]
                per_mu.append(np.linalg.norm(L @ coefs[:, i] - b))
            dists.append(min(per_mu))
        sols.append(v[:, int(np.argmin(dists))])
    return np.stack(sols, axis=1)


def test_lars_device_f32_matches_host_f64():
    """On-chip f32 homotopy == host f64 breakpoints to <= 1e-4 (fails at
    bf16 matmul precision; reference inverse_problems/lars.py:90-94)."""
    rng = np.random.RandomState(3)
    for trial in range(3):
        m, K = 18 + trial, 10 + trial
        D = rng.normal(size=(m, K))
        x = rng.normal(size=m)
        cn, an = lars_lasso_path_np(D, x)
        pj, aj, steps = jax.jit(
            lambda D, x: lars_lasso_jax(D, x, max_steps=60)
        )(jnp.asarray(D, jnp.float32), jnp.asarray(x, jnp.float32))
        pj, aj = np.asarray(pj), np.asarray(aj)
        assert int(steps) + 1 == cn.shape[1]
        assert np.abs(pj[: cn.shape[1]].T - cn).max() < 1e-4
        assert np.abs(aj[: len(an)] - an).max() < 1e-4


def test_batched_dictionary_recovery_on_chip():
    """DicRecoveryMap.compute_state_batched on the chip == numpy oracle
    (VERDICT r2 next-round item 3 'Done' criterion: <= 1e-4)."""
    p = _problem(0)
    max_steps, scale, ols = 24, 1e3, True
    mdist = ResidualDistanceDiscrete(
        AffineDense(jnp.asarray(p["lhs"], jnp.float32), p["coeffs"]),
        AffineDense(jnp.asarray(p["rhs"], jnp.float32), p["coeffs"]),
        [{"diffusion": jnp.asarray(mu["diffusion"], jnp.float32)}
         for mu in p["mus"]],
    )
    rm = DicRecoveryMap(
        jnp.asarray(p["V"], jnp.float32), jnp.asarray(p["W"], jnp.float32),
        manifold_distance=mdist, log_level=30,
    )
    got = np.asarray(rm.compute_state_batched(
        jnp.asarray(p["w"], jnp.float32), scale=scale, ols=ols,
        max_steps=max_steps,
    ))
    want = _oracle_recovery(p, max_steps, scale, ols)
    scale_ref = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale_ref < 1e-4


def test_pbdw_on_chip_matches_host():
    p = _problem(1)
    G = np.eye(p["W"].shape[1])
    CG = p["W"].T @ p["V"]
    rm = PbdwRecoveryMap(
        jnp.asarray(p["V"], jnp.float32), jnp.asarray(p["W"], jnp.float32),
        gramian=jnp.asarray(G, jnp.float32),
        cross_gramian=jnp.asarray(CG, jnp.float32), log_level=30,
    )
    u_dev = np.asarray(rm.solve(jnp.asarray(p["w"], jnp.float32)))
    # host f64 saddle solve
    nv, m = CG.shape[1], CG.shape[0]
    A = np.block([[G, CG], [CG.T, np.zeros((nv, nv))]])
    b = np.concatenate([p["w"], np.zeros((nv, p["w"].shape[1]))], axis=0)
    sol = np.linalg.solve(A, b)
    v, eta = sol[m:], np.linalg.solve(G, p["w"] - CG @ sol[m:])
    u_host = p["V"] @ v + p["W"] @ eta
    rel = np.abs(u_dev - u_host).max() / max(1.0, np.abs(u_host).max())
    assert rel < 1e-4
