#!/usr/bin/env python
"""Diagnostic: Pallas vs XLA bandwidth on this device.

Measures (1) XLA fused-reduction read bandwidth, (2) a read-only Pallas
grid kernel at several block shapes. On the axon-tunneled v5e the Pallas
path reaches only ~30% of the XLA path — see PERF.md; rerun this on real
hardware before trusting any Pallas-vs-XLA kernel decision.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import time

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def read_only(x4, Q, R):
    m, P = x4.shape[0], x4.shape[1]

    def kernel(x_ref, out_ref):
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[0, 0, :] += jnp.sum(x_ref[0, 0], axis=0)[:128]

    return pl.pallas_call(
        kernel, grid=(m, P),
        in_specs=[pl.BlockSpec((1, 1, Q, R), lambda r, p: (r, p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 128), lambda r, p: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1, 128), jnp.float32),
    )(x4)


def timed(f, x, iters=4):
    _ = np.asarray(f(x))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    d, rows = 24, 16
    n = 1 << d
    x = jax.random.normal(jax.random.key(0), (rows, n), jnp.float32)
    _ = np.asarray(jnp.sum(x))
    nbytes = rows * n * 4

    t = timed(jax.jit(lambda v: jnp.sum(v)), x)
    print(f"XLA jnp.sum read: {nbytes / t / 1e9:.1f} GB/s")

    for dq, dr in [(8, 11), (8, 12)]:
        Q, R = 1 << dq, 1 << dr
        x4 = x.reshape(rows, n // (Q * R), Q, R)
        t = timed(jax.jit(lambda v, Q=Q, R=R: jnp.sum(read_only(v, Q, R))), x4)
        print(f"Pallas read-only ({Q},{R}) blocks: {nbytes / t / 1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
