"""TPU wall-clock: no-retrace padded greedy vs the retracing plain greedy.

VERDICT r1 next #6 'Done' criterion: greedy on the TPU with zero retraces
after step 1; wall-clock recorded in PERF.md. Uses the thermal block at a
moderate size (host FOM solves; sketches + sweeps on the TPU chip).
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))


import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import numpy as np

    from rla4mor_tpu.models import ThermalBlockFOM
    from rla4mor_tpu.mor import (
        PaddedSketchedReductor,
        SketchedReductor,
        rb_greedy,
        rb_greedy_no_retrace,
    )
    from rla4mor_tpu.ops import GaussianEmbedding

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    import time as _t

    t0 = _t.perf_counter()
    np.asarray(jax.numpy.sum(jax.numpy.ones((8, 8))))
    print(f"tunnel probe: first tiny op {_t.perf_counter() - t0:.2f}s "
          "(if > ~1 s the tunnel is degraded and these wall-clocks are "
          "not comparable across sessions)", file=sys.stderr, flush=True)
    fom = ThermalBlockFOM((2, 2), 48)
    n = fom.solution_dim
    Ru = fom.h1_0_product
    k, k_on, r_max, n_train = 256, 128, 12, 64

    def mk(cls, **kw):
        theta = GaussianEmbedding.make(
            n, sqrt_product=Ru.sqrt, range_dim=k, seed=1
        )
        phi = GaussianEmbedding.make(k, range_dim=k_on, seed=101)
        return cls(fom, embedding_primal=theta, embedding_online=phi,
                   product=Ru, **kw)

    train = fom.parameter_space.sample_randomly(n_train, key=5)

    t0 = time.perf_counter()
    red_p = mk(PaddedSketchedReductor, r_max=r_max)
    res_p = rb_greedy_no_retrace(fom, red_p, train, max_extensions=r_max,
                                 online_seed=0, log_level=30)
    t_padded = time.perf_counter() - t0
    print(f"padded no-retrace greedy: {t_padded:.1f} s "
          f"({len(res_p.selected_mus)} extensions)", flush=True)

    t0 = time.perf_counter()
    red_h = mk(SketchedReductor)
    res_h = rb_greedy(fom, red_h, train, max_extensions=r_max,
                      online_seed=0, log_level=30)
    t_plain = time.perf_counter() - t0
    print(f"plain (retracing) greedy: {t_plain:.1f} s "
          f"({len(res_h.selected_mus)} extensions)", flush=True)

    print("padded estimates:", " ".join(f"{e:.3e}" for e in res_p.max_estimates),
          flush=True)
    print("plain  estimates:", " ".join(f"{e:.3e}" for e in res_h.max_estimates),
          flush=True)
    # f32 sweep roundoff can flip argmax ties and fork the greedy paths;
    # require agreement of the first iteration and same decay magnitude
    assert np.allclose(res_p.max_estimates[0], res_h.max_estimates[0], rtol=1e-2)
    print("first-iteration estimates agree (1e-3)", flush=True)
    print(f"speedup: {t_plain / t_padded:.2f}x", flush=True)


if __name__ == "__main__":
    main()
