"""Batched online serving of shipped ROMs.

The reference's online stage is a per-mu Python call chain (pyMOR
``StationaryModel.solve`` produced by
``mor/sketched_reductor.py:121-208``, solved one parameter at a time in
user scripts); it has no batching and no deployment story.  Here the
whole online stage of every ROM that :func:`rla4mor_tpu.mor.save_rom`
can ship — :class:`~rla4mor_tpu.models.stationary.StationaryROM`,
:class:`~rla4mor_tpu.models.instationary.InstationaryROM`,
:class:`~rla4mor_tpu.models.wave.WaveROM` and both corrected-output
composites — runs as ONE jitted program over a parameter batch:

* requests batch into a single device program (solve + error estimate +
  output per mu), so serving throughput is MXU-bound instead of
  dispatch-bound (PERF.md "Online serving");
* the ROM is a PYTREE ARGUMENT of the program, not a closed-over
  constant: ``jax.jit`` keys on pytree structure + leaf shapes/dtypes,
  so a model refresh (a re-reduced ROM at the same reduced dimensions —
  a newer offline greedy run, or ``load_rom`` of a newer artifact) is
  served by the already-compiled executable.  Zero-recompile hot swap;
* :func:`pad_batch` lets a serving process quantize request counts onto
  a small set of accepted batch sizes, so arbitrary traffic reuses a
  handful of compiles.

Typical serving loop::

    rom = load_rom("model.npz")
    mus, n = pad_batch(request_mus, accepted_batch_size)
    out = serve_batch(rom, mus)          # jitted; compiled once per
    results = jax.tree.map(lambda x: x[:n], out)   # (shape, structure)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def evaluate(rom, mu):
    """Single-mu online stage of any shippable ROM -> dict.

    Trace-time dispatch on the ROM type (the pytree structure is part of
    the jit key, so each ROM kind gets its own executable):

    * corrected-output composites -> ``{"output", "estimate"}`` via
      ``output_corrected`` (the primal trajectory is internal there);
    * time-dependent ROMs (have ``est_lhs``) -> ``{"u"}`` plus
      ``"estimate"`` when reduced with an embedding and ``"output"``
      when the family defines one;
    * stationary ROMs -> ``{"u"}`` plus optional ``"estimate"`` /
      ``"output"``.
    """
    if hasattr(rom, "output_corrected"):
        s, eta = rom.output_corrected(mu)
        return {"output": s, "estimate": eta}
    if hasattr(rom, "est_lhs"):  # InstationaryROM / WaveROM scan models
        if rom.est_lhs is not None:
            u, eta = rom.solve(mu, return_estimate=True)
            res = {"u": u, "estimate": eta}
        else:
            res = {"u": rom.solve(mu)}
        if rom.output_functional is not None:
            res["output"] = rom.output(res["u"], mu)
        return res
    u = rom.solve(mu)
    res = {"u": u}
    if getattr(rom, "error_estimator", None) is not None:
        res["estimate"] = rom.error_estimator.estimate_error(u, mu)
    if getattr(rom, "output_functional", None) is not None:
        res["output"] = rom.output(u, mu)
    return res


def evaluate_batch(rom, mus_batched):
    """vmap of :func:`evaluate` over a batched Mu (leading batch axis on
    every leaf).  Not jitted — compose freely."""
    return jax.vmap(lambda mu: evaluate(rom, mu))(mus_batched)


#: The serving entry point: ``serve_batch(rom, mus_batched)``.  jit keys
#: on (ROM pytree structure, leaf shapes/dtypes, batch shape) — swapping
#: in a same-shaped ROM or re-sending the same batch size reuses the
#: compiled executable (tested: tests/test_serve.py).
serve_batch = jax.jit(evaluate_batch)


def serve_batch_sharded(rom, mus_batched, mesh, batch_axis: str = "mu"):
    """Data-parallel serving over a device mesh.

    The ROM pytree is replicated (it is small — dense reduced stacks),
    the request batch is sharded over ``batch_axis``, and the same jitted
    :func:`serve_batch` program runs SPMD: each request's online stage is
    independent, so GSPMD partitions the vmapped program with zero
    collectives in the hot path.  Serving throughput scales linearly in
    mesh size until the per-device batch stops filling the MXU.

    The batch size must be a multiple of the mesh axis size — quantize
    traffic with :func:`pad_batch` onto multiples of
    ``mesh.shape[batch_axis]``.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n_axis = mesh.shape[batch_axis]
    leaves = jax.tree.leaves(mus_batched)
    if leaves and leaves[0].shape[0] % n_axis:
        raise ValueError(
            f"serve_batch_sharded: batch {leaves[0].shape[0]} not a "
            f"multiple of mesh axis '{batch_axis}' ({n_axis}); pad with "
            "pad_batch first"
        )
    rep = NamedSharding(mesh, PartitionSpec())
    shard = NamedSharding(mesh, PartitionSpec(batch_axis))
    rom_r = jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, rom
    )
    mus_s = jax.tree.map(lambda x: jax.device_put(x, shard), mus_batched)
    return serve_batch(rom_r, mus_s)


def pad_batch(mus_batched, batch_size: int) -> Tuple[dict, int]:
    """Pad a batched Mu up to ``batch_size`` rows -> (padded, n_valid).

    Pads by repeating the LAST request (edge mode), so padding rows stay
    inside the parameter domain — they solve cleanly and are simply
    dropped by ``x[:n_valid]`` on the way out.  Quantizing request
    counts onto a few accepted sizes keeps the number of compiled
    programs bounded regardless of traffic.
    """
    leaves = jax.tree.leaves(mus_batched)
    if not leaves:
        raise ValueError("pad_batch: empty parameter batch")
    n = int(leaves[0].shape[0])
    if n > batch_size:
        raise ValueError(
            f"pad_batch: {n} requests exceed batch_size={batch_size}; "
            "split the batch (or pick a larger accepted size)"
        )
    if n == batch_size:
        return mus_batched, n
    pad = batch_size - n
    padded = jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0
        ),
        mus_batched,
    )
    return padded, n
