"""rla4mor_tpu — TPU-native randomized linear algebra for parametric model
order reduction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
``rla4mor`` reference library (random sketching embeddings, sketched
reduced-basis reduction, sketched-HS-norm parametric preconditioners, and
inverse problems / state estimation), re-designed TPU-first:

* the operator algebra is a minimal JAX-native affine-parametric calculus
  (typed pytrees + explicit projection/concatenation) instead of a symbolic
  rewriter (reference relies on pyMOR's expand/contract rule engine),
* embeddings are pure functions of a PRNG seed with per-block ``fold_in``
  derivation, so sharded and unsharded sketches agree by construction,
* the fast Walsh–Hadamard transform is computed as Kronecker-factor matmuls
  on the MXU (plus a fused Pallas kernel) instead of a butterfly loop,
* online ROM solves are jittable and vmappable over parameter batches,
* large-DoF problems shard the DoF axis over a ``jax.sharding.Mesh``.

Subpackages
-----------
core      parameters, linear operators, affine algebra, products, POD/GS
ops       random embeddings, FWHT/SRHT kernels (XLA + Pallas), LARS
models    model problems (thermal block FEM), StationaryFOM / StationaryROM
mor       sketched reduced-basis reductor + greedy driver
precond   sketched-HS-norm parametric preconditioner machinery
estim     inverse problems: PBDW / dictionary recovery, manifold distances
parallel  mesh / sharding helpers for pod-scale sketching
serve     batched online serving of shipped ROMs (jitted, hot-swappable)
"""

__version__ = "0.1.0"

from rla4mor_tpu.utils import config  # noqa: F401
