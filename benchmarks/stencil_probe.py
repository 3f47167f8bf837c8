#!/usr/bin/env python
"""Stencil matvec throughput: gather form vs the old scatter-add form.

The Q1 per-element-coefficient Laplacian apply (models/stencil.py) is the
CG hot loop of the big-n path. Amortized over a 100-apply scan (the real
workload shape; single calls drown in the ~22 ms axon dispatch):
measured on the v5e at 2048^2 nodes — scatter 0.343 ms/apply
(147 GB/s effective on the 12 B/node minimum-traffic model), gather
0.167 ms/apply (301 GB/s): the four scatter-adds block XLA fusion; the
gather form is one elementwise pass. Run: python benchmarks/stencil_probe.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp

from rla4mor_tpu.models.stencil import _K_EL, interior_mask, stencil_apply


def stencil_apply_scatter(u, kappa_el):
    """The pre-round-2 scatter-add formulation (kept as the comparison
    point; bit-identical results)."""
    mask = interior_mask(u.shape[0], u.dtype)
    u = u * mask
    c = (u[:-1, :-1], u[:-1, 1:], u[1:, :-1], u[1:, 1:])
    K = _K_EL
    out = jnp.zeros_like(u)
    contrib = []
    for a in range(4):
        s = K[a][0] * c[0] + K[a][1] * c[1] + K[a][2] * c[2] + K[a][3] * c[3]
        contrib.append(kappa_el * s)
    out = out.at[:-1, :-1].add(contrib[0])
    out = out.at[:-1, 1:].add(contrib[1])
    out = out.at[1:, :-1].add(contrib[2])
    out = out.at[1:, 1:].add(contrib[3])
    return out * mask


def main(N=2047, iters=100):
    u = jax.random.normal(jax.random.PRNGKey(0), (N + 1, N + 1), jnp.float32)
    kap = jnp.abs(
        jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.float32)
    ) + 0.5
    import numpy as np

    a = np.asarray(stencil_apply(u[:257, :257], kap[:256, :256]))
    b = np.asarray(stencil_apply_scatter(u[:257, :257], kap[:256, :256]))
    print("gather vs scatter max abs diff:", np.abs(a - b).max())

    for name, fn in (("scatter", stencil_apply_scatter),
                     ("gather (default)", stencil_apply)):
        @jax.jit
        def chain(u, kap, fn=fn):
            def body(v, _):
                v = fn(v, kap)
                return v / jnp.linalg.norm(v), None
            v, _ = jax.lax.scan(body, u, None, length=iters)
            return jnp.sum(v * v)

        float(chain(u, kap))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(u, kap))  # host transfer = sync on axon
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.022) / iters
        nb = (u.size * 2 + kap.size) * 4
        print(f"{name}: {t * 1e3:.3f} ms/apply -> "
              f"{nb / t / 1e9:.1f} GB/s (12B/node model)")


if __name__ == "__main__":
    main()
