"""State estimation / inverse problems: recovery maps.

Rebuild of reference ``RecoveryMap`` / ``PbdwRecoveryMap`` /
``DicRecoveryMap`` (inverse_problems/recovery_map.py:38,114,160): recover a
full state u from m linear observations w = W^H R u.

* PBDW: solve the (m+n) saddle system
  [[G, CG], [CG^H, 0]] [eta; v] = [w; 0]  (reference :139-144), then
  u = V v + W eta.  Batched over snapshots (one jitted solve).
* Dictionary recovery: LASSO-LARS path over the cross-gramian dictionary,
  per-path-point observation-space corrections, and selection of the path
  point with minimal distance to the solution manifold (reference
  :170-307). The manifold distances for *all* path points evaluate in one
  vmapped call.

Conventions: bases are column matrices V (n, nv), W (n, m); gramian
G = W^H R W (m, m); cross-gramian CG = W^H R V (m, nv).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.products import Product
from rla4mor_tpu.estim.lars import (
    lars_weighted_path,
    lars_weighted_path_complex,
    lars_weighted_path_complex_jax,
    lars_weighted_path_group,
    lars_weighted_path_group_jax,
    lars_weighted_path_jax,
)
from rla4mor_tpu.estim.manifold_distance import ManifoldDistance
from rla4mor_tpu.utils.logger import get_logger


class RecoveryMap:
    def __init__(
        self,
        V,
        W,
        gramian=None,
        cross_gramian=None,
        product: Optional[Product] = None,
        manifold_distance: Optional[ManifoldDistance] = None,
        log_level: int = 20,
    ):
        self.V = jnp.asarray(V)
        self.W = jnp.asarray(W)
        n = self.V.shape[0]
        self.product = product if product is not None else Product.identity(n)
        if gramian is None:
            gramian = self.product.inner(self.W, self.W)
        if cross_gramian is None:
            cross_gramian = self.product.inner(self.W, self.V)
        self.gramian = jnp.asarray(gramian)
        self.cross_gramian = jnp.asarray(cross_gramian)
        self.manifold_distance = manifold_distance
        self.logger = get_logger("estim.recovery", log_level)

    # -- core ------------------------------------------------------------------
    def compute_state(self, w, **kwargs):
        raise NotImplementedError

    def compute_correction(self, w, v):
        """eta = G^-1 (w - CG v)  (reference :101-103)."""
        w = jnp.asarray(w)
        v = jnp.asarray(v)
        # HIGHEST: the correction feeds the manifold-distance selection;
        # bf16-truncated f32 residuals (~2e-3) would reorder path points
        return jnp.linalg.solve(
            self.gramian,
            w - jnp.matmul(self.cross_gramian, v,
                           precision=jax.lax.Precision.HIGHEST),
        )

    def solve(self, w, correct: bool = True, **kwargs):
        """Recover states: u = V v (+ W eta). w is (m,) or (m, k)."""
        w = jnp.asarray(w)
        single = w.ndim == 1
        wm = w[:, None] if single else w
        v = self.compute_state(wm, **kwargs)
        hi = jax.lax.Precision.HIGHEST
        u = jnp.matmul(self.V, v, precision=hi)
        if correct:
            eta = self.compute_correction(wm, v)
            u = u + jnp.matmul(self.W, eta, precision=hi)
        return u[:, 0] if single else u

    # -- restrictions (convergence studies) -----------------------------------
    def _replace(self, **kw):
        out = object.__new__(type(self))
        out.__dict__.update(self.__dict__)
        # never share the jitted-program cache: its closures bake in THIS
        # instance's gramians/manifold distance, so a restricted copy
        # hitting the parent's cache would silently recover with the
        # parent's operators (round-2 review finding, repro'd)
        out.__dict__.pop("_batched_cache", None)
        out.__dict__.update(kw)
        return out

    def project_background(self, indices):
        """Restrict the background basis V (reference :148-151, :320-326)."""
        indices = jnp.asarray(indices)
        kw = dict(
            V=self.V[:, indices], cross_gramian=self.cross_gramian[:, indices]
        )
        if self.manifold_distance is not None:
            nv, m = self.V.shape[1], self.W.shape[1]
            ind = jnp.concatenate([indices, nv + jnp.arange(m)])
            kw["manifold_distance"] = self.manifold_distance.project(ind)
        return self._replace(**kw)

    def project_observation(self, indices):
        """Restrict the observation basis W (reference :153-157, :328-335)."""
        indices = jnp.asarray(indices)
        kw = dict(
            W=self.W[:, indices],
            gramian=self.gramian[jnp.ix_(indices, indices)],
            cross_gramian=self.cross_gramian[indices, :],
        )
        if self.manifold_distance is not None:
            nv = self.V.shape[1]
            ind = jnp.concatenate([jnp.arange(nv), nv + indices])
            kw["manifold_distance"] = self.manifold_distance.project(ind)
        return self._replace(**kw)


class PbdwRecoveryMap(RecoveryMap):
    """Parametrized-background data-weak recovery (saddle-point solve)."""

    def compute_state(self, w, **kwargs):
        w = jnp.asarray(w)
        m = self.W.shape[1]
        nv = self.V.shape[1]
        A = jnp.block(
            [
                [self.gramian, self.cross_gramian],
                [
                    self.cross_gramian.conj().T,
                    jnp.zeros((nv, nv), dtype=self.gramian.dtype),
                ],
            ]
        )
        b = jnp.concatenate(
            [w, jnp.zeros((nv, w.shape[1]), dtype=w.dtype)], axis=0
        )
        return jnp.linalg.solve(A, b)[m:, :]


class DicRecoveryMap(RecoveryMap):
    """Dictionary-based multi-space recovery with LARS sparse selection."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # requires an orthonormal observation basis (reference :166);
        # tolerance follows the working dtype (f32 on TPU, f64 oracles)
        gdtype = np.asarray(self.gramian).dtype
        tol = max(1e-8, 1e3 * float(np.finfo(gdtype).eps))
        if gdtype == np.float32 and jax.default_backend() != "cpu":
            # default TPU matmul truncates f32 inputs to bf16 (measured
            # gramian deviation ~5e-3 for an exactly R-orthonormal W) —
            # the check itself carries that error and must tolerate it
            tol = max(tol, 4 * 2.0**-8)
        assert np.allclose(
            np.asarray(self.gramian), np.eye(self.W.shape[1]), atol=tol
        ), "DicRecoveryMap requires an R-orthonormal observation basis W"
        if self.manifold_distance is not None:
            assert (
                self.V.shape[1] + self.W.shape[1]
                == self.manifold_distance.lhs.source_dim
            )

    def _resolve_max_steps(self, max_steps):
        """None -> enough fixed-shape homotopy steps to cover the full
        variable-length host path: LASSO add/drop oscillations routinely
        take ~5x the dictionary size (162 steps observed for K=30 on the
        thermal block), so 6*K_eff + 16 with K_eff doubled for the
        real-stacked complex dictionary."""
        if max_steps is not None:
            return int(max_steps)
        K = self.cross_gramian.shape[1]
        if jnp.iscomplexobj(self.cross_gramian):
            K *= 2
        return 6 * K + 16

    # -- path machinery ---------------------------------------------------------
    def compute_state_path(self, w, alpha=0.0, weights=None, scale=1e3,
                           ols=True, return_path=True, solver="jax",
                           max_steps=None, complex_mode="group", **kwargs):
        """LARS path of dictionary coefficients (reference :170-206).

        ``solver``: 'jax' (default) = fixed-shape on-device path
        (``max_steps`` points, converged tail repeated); 'np' = exact
        variable-length host path, kept as the oracle — the analog of the
        reference's sklearn/spams backend switch (reference lars.py:46-56),
        with the device path replacing spams (VERDICT r1 weak #6).

        Complex dictionaries (e.g. Helmholtz snapshots):
        ``complex_mode='group'`` (default) runs the TRUE rotation-
        invariant complex homotopy (modulus penalty, one atom = one path
        variable, ``lars_weighted_path_group``); ``'stacked'`` keeps the
        R^{2n} real-stacking reduction (half-atom-support caveat in
        ``lars_weighted_path_complex``'s docstring)."""
        assert complex_mode in ("group", "stacked"), complex_mode
        is_complex = jnp.iscomplexobj(self.cross_gramian) or \
            jnp.iscomplexobj(jnp.asarray(w))
        group = is_complex and complex_mode == "group"
        if solver == "jax":
            fn = (lars_weighted_path_group_jax if group
                  else lars_weighted_path_complex_jax if is_complex
                  else lars_weighted_path_jax)
            v, alphas, _ = fn(
                self.cross_gramian, jnp.asarray(w), alpha, weights, scale,
                ols, self._resolve_max_steps(max_steps),
            )
            return v, alphas
        fn = (lars_weighted_path_group if group
              else lars_weighted_path_complex if is_complex
              else lars_weighted_path)
        v, alphas = fn(
            np.asarray(self.cross_gramian), np.asarray(w), alpha, weights,
            scale, ols, return_path, **kwargs
        )
        return jnp.asarray(v), jnp.asarray(alphas)

    def compute_correction_path(self, w, v):
        """Corrections for every path point (reference :208-229)."""
        w = jnp.asarray(w).reshape(-1, 1)
        return self.compute_correction(
            jnp.broadcast_to(w, (w.shape[0], v.shape[1])), v
        )

    def _state_single(self, w, **kwargs):
        v, _ = self.compute_state_path(w, **kwargs)
        eta = self.compute_correction_path(w, v)
        coefs = jnp.concatenate([v, eta], axis=0)
        distances, _ = self.manifold_distance.evaluate(coefs)
        return v[:, int(np.argmin(distances))]

    def _batched_fn(self, ols: bool, max_steps: int, has_weights: bool,
                    is_complex: bool, complex_mode: str = "group"):
        """Per-instance cache of the jitted batched program: jax.jit caches
        by function identity, so a fresh closure per call would pay a full
        (minutes-long on the remote-compile TPU) recompile every time.

        ``is_complex`` must reflect the OBSERVATIONS too, not just the
        dictionary: a real cross-gramian with complex ``w`` needs the
        real-stacking LARS exactly like ``compute_state_path`` (feeding a
        complex carry into the real homotopy is a while_loop type error)."""
        cache = self.__dict__.setdefault("_batched_cache", {})
        key = (ols, max_steps, has_weights, is_complex, complex_mode)
        fn = cache.get(key)
        if fn is not None:
            return fn
        md = self.manifold_distance
        CG, G = self.cross_gramian, self.gramian
        lars_fn = (
            lars_weighted_path_group_jax
            if is_complex and complex_mode == "group"
            else lars_weighted_path_complex_jax if is_complex
            else lars_weighted_path_jax)

        def one(w, alpha, weights, scale):
            v, _, _ = lars_fn(
                CG, w, alpha, weights, scale, ols, max_steps
            )
            eta = jnp.linalg.solve(
                G, jnp.broadcast_to(w[:, None], (w.shape[0], v.shape[1]))
                - jnp.matmul(CG, v, precision=jax.lax.Precision.HIGHEST)
            )
            coefs = jnp.concatenate([v, eta], axis=0)
            d = md.distances(coefs)
            return jnp.take(v, jnp.argmin(d), axis=1)

        if has_weights:
            fn = jax.jit(jax.vmap(one, in_axes=(1, None, None, None),
                                  out_axes=1))
        else:
            fn = jax.jit(jax.vmap(
                lambda w, alpha, scale: one(w, alpha, None, scale),
                in_axes=(1, None, None), out_axes=1,
            ))
        cache[key] = fn
        return fn

    def compute_state_batched(self, w_batch, alpha=0.0, weights=None,
                              scale=1e3, ols=True, max_steps=None,
                              complex_mode="group"):
        """All snapshots at once: device LARS paths, observation-space
        corrections, manifold distances and path-point selection as ONE
        jitted vmap over observation columns (m, s) -> (nv, s).

        Replaces the reference's per-snapshot Python loop
        (inverse_problems/recovery_map.py:241-307 driven per column) with a
        single fixed-shape device program (VERDICT r1 weak #6)."""
        md = self.manifold_distance
        assert md is not None, "batched recovery needs a manifold distance"
        w_batch = jnp.asarray(w_batch)
        is_complex = bool(
            jnp.iscomplexobj(self.cross_gramian)
            or jnp.iscomplexobj(w_batch)
        )
        assert complex_mode in ("group", "stacked"), complex_mode
        fn = self._batched_fn(bool(ols), self._resolve_max_steps(max_steps),
                              weights is not None, is_complex, complex_mode)
        if weights is not None:
            return fn(w_batch, alpha, jnp.asarray(weights), scale)
        return fn(w_batch, alpha, scale)

    def compute_state(self, w, solver="jax", **kwargs):
        w = jnp.asarray(w)
        batched_kw = {"alpha", "weights", "scale", "ols", "max_steps",
                      "complex_mode"}
        md = self.manifold_distance
        # the batched path needs the jittable md.distances (subclasses that
        # implement only the host evaluate() fall back to per-column)
        md_batchable = (
            md is not None
            and type(md).distances is not ManifoldDistance.distances
        )
        if solver == "jax" and set(kwargs) <= batched_kw and md_batchable:
            return self.compute_state_batched(w, **kwargs)
        cols = [
            self._state_single(w[:, i], solver=solver, **kwargs)
            for i in range(w.shape[1])
        ]
        return jnp.stack(cols, axis=1)

    def solve_path(self, w, **kwargs):
        """All recoveries along the path + their manifold distances
        (reference :309-318)."""
        w = jnp.asarray(w)
        assert w.ndim == 1
        v, _ = self.compute_state_path(w, **kwargs)
        eta = self.compute_correction_path(w, v)
        hi = jax.lax.Precision.HIGHEST
        u = jnp.matmul(self.V, v, precision=hi) \
            + jnp.matmul(self.W, eta, precision=hi)
        coefs = jnp.concatenate([v, eta], axis=0)
        distances, _ = self.manifold_distance.evaluate(coefs)
        return u, distances
