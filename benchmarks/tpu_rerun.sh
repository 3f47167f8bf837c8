#!/bin/sh
# Pending TPU measurements (queued during the axon tunnel outage that
# started ~2026-08-17 22:20). Run on the TPU host when the tunnel is
# back; each step is independently bounded. Results go to PERF.md.
set -x
cd "$(dirname "$0")/.."

# 0. tunnel sanity (fails fast if still down)
timeout 300 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp')
print(jax.devices())
import jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))
" || exit 1

# 1. entry check + bench headline
timeout 1200 python __graft_entry__.py
timeout 1800 python bench.py

# 2. capstone, exact-score refinement (16.8M DoF; wall-clock per step +
#    estimate trace -> PERF.md "Round-3 continuation: score=exact")
timeout 3600 python examples/large_scale_demo.py \
  --grid 4095 --precond mg --sketch srht --score exact --steps 6

# 3. non-affine family at pod scale: two-grid + device-scan EIM offline
#    (record the offline wall-clock split: coarse greedy / fine rebuild)
timeout 3600 python examples/large_scale_demo.py \
  --family nonaffine --grid 2047 --eim-grid 63 --eim-scan \
  --sketch srht --precond mg --steps 4

# 4. 3-D 16.78M-DoF family (check the flat-SRHT 3-D reshape for the
#    re-tiling wall flagged in PERF.md round-3 notes)
timeout 3600 python examples/large_scale_demo.py \
  --family thermal3d --grid 255 --sketch srht --steps 3
