"""Probe: manual double-buffered DMA inside ONE Pallas grid step.

Round-1 found grid-pipelined Pallas DMA caps at ~30-115 GB/s on this
axon-tunneled chip (per-grid-step overhead ~45 us dominates 2 MiB block
DMAs). This probe bypasses the grid: a single kernel invocation drives
its own HBM->VMEM double-buffered async copies in a fori_loop.

P1: read-only (DMA + VPU sum)      -> the manual-DMA stream ceiling
P2: DMA + bf16 MXU dot per chunk   -> the SRHT-shaped rate
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=5):
    _ = np.asarray(fn(*args))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed_amortized(fn, *args, chain=6, reps=3):
    _ = np.asarray(fn(*args))
    best = float("inf")
    for _r in range(reps):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(chain)]
        _ = np.asarray(rs[-1])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def read_kernel(chunk_rows, num_chunks, hbm_ref, out_ref):
    def body(scratch, acc, sem):
        def get_dma(slot, idx):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()
        acc[:] = jnp.zeros_like(acc)

        def loop(i, _):
            slot = i % 2

            @pl.when(i + 1 < num_chunks)
            def _():
                get_dma((i + 1) % 2, i + 1).start()

            get_dma(slot, i).wait()
            acc[:] += jnp.sum(scratch[slot])
            return _

        jax.lax.fori_loop(0, num_chunks, loop, None)
        out_ref[:] = acc[:]

    cols = hbm_ref.shape[1]
    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, chunk_rows, cols), hbm_ref.dtype),
        acc=pltpu.VMEM((8, 128), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def dot_kernel(chunk_rows, num_chunks, k, hbm_ref, w_ref, out_ref):
    def body(scratch, acc, sem):
        def get_dma(slot, idx):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()
        acc[:] = jnp.zeros_like(acc)

        def loop(i, _):
            slot = i % 2

            @pl.when(i + 1 < num_chunks)
            def _():
                get_dma((i + 1) % 2, i + 1).start()

            get_dma(slot, i).wait()
            acc[:] += jax.lax.dot_general(
                scratch[slot], w_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            return _

        jax.lax.fori_loop(0, num_chunks, loop, None)
        out_ref[:] = acc[:]

    cols = hbm_ref.shape[1]
    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, chunk_rows, cols), hbm_ref.dtype),
        acc=pltpu.VMEM((chunk_rows, k), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def main():
    key = jax.random.key(0)
    ROWS, COLS = 8192, 32768  # 1 GiB f32
    x = jax.random.normal(key, (ROWS, COLS), jnp.float32)
    nb = ROWS * COLS * 4
    _ = np.asarray(jnp.sum(x))

    t = timed(jax.jit(jnp.sum), x)
    ta = timed_amortized(jax.jit(jnp.sum), x)
    print(f"roof(sum 1GiB): sync {t*1e3:6.1f} ms ({nb/t/1e9:6.1f} GB/s) | "
          f"amort {ta*1e3:6.1f} ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)

    for chunk_rows in (16, 32):  # 2 MiB / 4 MiB chunks
        num_chunks = ROWS // chunk_rows
        f = pl.pallas_call(
            functools.partial(read_kernel, chunk_rows, num_chunks),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        fj = jax.jit(lambda v, f=f: jnp.sum(f(v)))
        try:
            t = timed(fj, x)
            ta = timed_amortized(fj, x)
        except Exception as e:
            print(f"P1 read chunk={chunk_rows}r: FAILED {e!r}", flush=True)
            continue
        print(f"P1 read chunk={chunk_rows * COLS * 4 >> 20} MiB: sync "
              f"{t*1e3:6.1f} ms ({nb/t/1e9:6.1f} GB/s) | amort {ta*1e3:6.1f}"
              f" ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)

    # P2: SRHT-shaped — reshape to (M, 2048) and dot with (2048, 256)
    R, K = 2048, 256
    xr = x.reshape(-1, R)  # (524288, 2048)
    M = xr.shape[0]
    w = jax.random.normal(jax.random.fold_in(key, 1), (R, K), jnp.float32)
    for chunk_rows in (256, 512):  # 2 MiB / 4 MiB f32 chunks
        num_chunks = M // chunk_rows
        f = pl.pallas_call(
            functools.partial(dot_kernel, chunk_rows, num_chunks, K),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((chunk_rows, K), jnp.float32),
        )
        fj = jax.jit(lambda v, wv, f=f: jnp.sum(f(v, wv) ** 2))
        try:
            t = timed(fj, xr, w)
            ta = timed_amortized(fj, xr, w)
        except Exception as e:
            print(f"P2 dot chunk={chunk_rows}r: FAILED {e!r}", flush=True)
            continue
        print(f"P2 dot chunk={chunk_rows * R * 4 >> 20} MiB: sync "
              f"{t*1e3:6.1f} ms ({nb/t/1e9:6.1f} GB/s) | amort {ta*1e3:6.1f}"
              f" ms ({nb/ta/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
