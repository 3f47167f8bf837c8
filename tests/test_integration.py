"""Capstone integration: the full reference workflow on one FOM.

Chains every major subsystem the way a reference user would (SURVEY §3 call
stacks): SRHT-sketched greedy RB -> online ROM, sketched-HS preconditioned
solves at the same parameters, and dictionary-based state recovery from
point observations — all sharing one FOM, product and seed discipline."""

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core import (
    ChainOp,
    HostLUInverse,
    compose,
    gram_schmidt,
    materialize,
    project,
)
from rla4mor_tpu.estim import DicRecoveryMap, ResidualDistanceAffine
from rla4mor_tpu.models import ThermalBlockFOM
from rla4mor_tpu.mor import SketchedReductor, rb_greedy_padded
from rla4mor_tpu.ops import (
    GaussianEmbedding,
    SrhtEmbedding,
    VectorizedEmbedding,
)
from rla4mor_tpu.precond import PreconditionedReductor


def test_full_workflow():
    fom = ThermalBlockFOM((2, 2), 16)
    Ru = fom.h1_0_product
    n = fom.solution_dim
    space = fom.parameter_space

    # ---- 1) sketched greedy RB (SRHT primal sketch, padded driver)
    theta = SrhtEmbedding.make(n, sqrt_product=Ru.sqrt, range_dim=250, seed=0)
    phi = GaussianEmbedding.make(250, range_dim=120, seed=1)
    red = SketchedReductor(fom, embedding_primal=theta, embedding_online=phi,
                           product=Ru, log_level=40)
    training = space.sample_randomly(30, key=0)
    result = rb_greedy_padded(fom, red, training, max_extensions=9,
                              log_level=40)
    rom = result.rom

    mu_test = space.sample_randomly(3, key=9)
    for mu in mu_test:
        u_fom = np.asarray(fom.solve(mu))
        u_rom = np.asarray(red.reconstruct(rom.solve(mu)))
        rel = float(Ru.norm(jnp.asarray(u_fom - u_rom))) / float(
            Ru.norm(jnp.asarray(u_fom)))
        assert rel < 3e-2

    # ---- 2) preconditioned solves reusing the greedy basis
    U = red.rb
    r = U.shape[1]
    K = 12
    sig = GaussianEmbedding.make(r, range_dim=K, seed=20)
    om = GaussianEmbedding.make(r, range_dim=K, seed=21)
    gam = VectorizedEmbedding(
        embedding=GaussianEmbedding.make(K * K, range_dim=16, seed=22),
        rows=K, cols=K)
    pre = PreconditionedReductor(
        fom=fom, reduced_basis=U,
        source_bases={"ur_ur": U}, range_bases={"ur_ur": U},
        source_embeddings={"ur_ur": sig}, range_embeddings={"ur_ur": om},
        vec_embeddings={"ur_ur": gam},
        residual_embedding=GaussianEmbedding.make(
            n, sqrt_product=Ru.sqrt, range_dim=150, seed=23),
        product=Ru, stable_galerkin=False, log_level=40,
    )
    for mu in result.selected_mus[:3]:
        pre.add_preconditioner(HostLUInverse(fom.assemble_sparse(mu)), mu)

    mu = mu_test[0]
    u_pre, mu_p = pre.solve(mu, "ur_ur")
    u_pre_full = np.asarray(U) @ np.asarray(u_pre)
    u_fom = np.asarray(fom.solve(mu))
    rel = float(Ru.norm(jnp.asarray(u_pre_full - u_fom))) / float(
        Ru.norm(jnp.asarray(u_fom)))
    assert rel < 5e-2
    # at an interpolation point the HS estimate vanishes
    mu_i = result.selected_mus[0]
    _, rnorm = pre.minimize_hs_estimator(mu_i, "ur_ur")
    assert float(rnorm) < 1e-8

    # ---- 3) state recovery from point observations with the same product
    rng = np.random.RandomState(0)
    m_obs = 30
    rows = rng.choice(n, size=m_obs, replace=False)
    Wd = np.zeros((n, m_obs))
    Wd[rows, np.arange(m_obs)] = 1.0
    W = gram_schmidt(jnp.asarray(np.asarray(Ru.inv.apply(jnp.asarray(Wd)))),
                     product=Ru)
    mus_dic = space.sample_randomly(30, key=4)
    u_dic = fom.solve_many(mus_dic)
    V_dic = np.asarray(u_dic) / np.asarray(Ru.norm(u_dic))[None, :]
    X = jnp.concatenate([jnp.asarray(V_dic), W], axis=1)
    S = GaussianEmbedding.make(n, sqrt_product=Ru.sqrt, range_dim=128, seed=30)
    chain = ChainOp((S, Ru.inv))
    mdist = ResidualDistanceAffine(
        project(compose(chain, fom.operator), None, X),
        materialize(compose(chain, fom.rhs)),
        ([space.low] * 4, [space.high] * 4), pg_iters=400,
    )
    rm = DicRecoveryMap(jnp.asarray(V_dic), W, product=Ru,
                        manifold_distance=mdist, log_level=40)
    u_true = fom.solve(mu_test[1])
    obs = Ru.inner(W, u_true).reshape(-1)
    u_rec = np.asarray(rm.solve(obs))
    rel = float(Ru.norm(jnp.asarray(u_rec - np.asarray(u_true)))) / float(
        Ru.norm(u_true))
    assert rel < 5e-2
