"""Global configuration knobs.

The reference library configures per-object behavior through constructor
kwargs and an ``options`` FrozenDict (reference: rla/embeddings.py:30-33).
Here the few global knobs live in one module; everything else is explicit
dataclass/constructor arguments.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def enable_x64(enable: bool = True) -> None:
    """Enable float64 in JAX (needed for the 1e-10 CPU oracle tests)."""
    jax.config.update("jax_enable_x64", enable)


def default_dtype() -> jnp.dtype:
    """Default real dtype: float64 when x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def num_devices() -> int:
    return jax.device_count()


def force_cpu_devices(n: int = 8) -> None:
    """Request ``n`` virtual CPU devices (must run before first jax use).

    Used by the test-suite to exercise multi-chip sharding without TPUs
    (XLA_FLAGS=--xla_force_host_platform_device_count).
    """
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    pat = r"--xla_force_host_platform_device_count=(\d+)"
    m = re.search(pat, flags)
    if m is None:
        flags = (flags + f" --xla_force_host_platform_device_count={n}").strip()
    elif int(m.group(1)) < n:
        # RAISE a smaller pre-pinned count (an earlier tool/profile export)
        # instead of silently keeping it; never lower a larger one
        flags = re.sub(
            pat, f"--xla_force_host_platform_device_count={n}", flags
        )
    os.environ["XLA_FLAGS"] = flags
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # the env var alone is NOT enough: the shell ships JAX_PLATFORMS=axon
    # (setdefault keeps it) and that plugin ignores the env var anyway
    # (CLAUDE.md) — the config API is the only reliable switch
    jax.config.update("jax_platforms", "cpu")
