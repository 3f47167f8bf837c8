"""Empirical interpolation (EIM / DEIM) for non-affine coefficients.

Beyond-reference addition: the reference framework is affine-only — every
operator it sketches is a pyMOR LincombOperator with known theta(mu)
(SURVEY §2.3). EIM closes the gap for NON-affine parametric fields
kappa(mu, x): the greedy builds magic points + a basis so that

    kappa(mu, .) ~= sum_q theta_q(mu) xi_q(.),
    theta(mu) = T^{-1} kappa(mu, points)

— an affine surrogate whose coefficients need only M point evaluations
of the field (O(M), not O(n)). The surrogate slots straight into the
affine machinery: ``core.affine.AffineOp``, the sketched reductors, and
the pod-scale stencil-FOM protocol of ``parallel/driver.py``
(``models/stencil_nonaffine.py`` wires a Gaussian-bump conductivity this
way).

Algorithms (standard, implemented from the papers):

* EIM greedy — Barrault/Maday/Nguyen/Patera 2004: residual-normalized
  basis, unit-lower-triangular interpolation matrix, sup-norm greedy on
  both the snapshot and the point.
* DEIM — Chaturantabut/Sorensen 2010: POD basis + greedy argmax points,
  general (dense-solve) interpolation matrix.

TPU shape: the offline greedy is a host loop over at most ``max_terms``
iterations whose inner work is (n, m)-sized device matmuls; the ONLINE
evaluation (``coefficients`` / ``interpolate``) is a fixed-shape (M, M)
triangular/dense solve — jittable, vmappable over mu batches, and static
under jit when the interpolant is closed over (arrays become
compile-time constants of the traced program).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class EimInterpolant:
    """Magic-point interpolant ``g ~= basis @ coefficients(g[points])``.

    ``triangular`` marks the EIM construction (interp_matrix is unit
    lower triangular — solve_triangular); DEIM uses a general solve.
    ``sup_errors`` is the greedy's sup-norm error history (EIM) or the
    POD singular values (DEIM) — both certify the training-set fit.

    The last ``n_reserve`` terms (``eim_greedy(reserve=...)``) are
    certification-only: interpolation uses the first M = n_terms active
    terms; the reserve magic points feed ``error_indicator`` — the
    classic EIM a-posteriori estimate (the interpolation error evaluated
    at the next greedy points, a LOWER bound on the sup error that
    tracks it closely on smooth families).
    """

    basis: jax.Array          # (n, M + n_reserve)
    points: jax.Array         # (M + n_reserve,) int32 flat field indices
    interp_matrix: jax.Array  # (M + R, M + R) = basis[points, :]
    triangular: bool
    sup_errors: Tuple[float, ...] = ()
    n_reserve: int = 0
    # training-snapshot column picked at each greedy step (EIM greedy
    # only; () for DEIM / rebuilt interpolants) — feeds two-grid rebuilds
    snapshot_ids: Tuple[int, ...] = ()

    @property
    def n_terms(self) -> int:
        """Number of ACTIVE interpolation terms (reserve excluded)."""
        return int(self.basis.shape[1]) - self.n_reserve

    @property
    def active_points(self) -> jax.Array:
        return self.points[: self.n_terms]

    @property
    def reserve_points(self) -> jax.Array:
        return self.points[self.n_terms:]

    def coefficients(self, g_at_points: jax.Array) -> jax.Array:
        """theta (M,) or (M, b) from field values at the ACTIVE magic
        points ((M,) or (M, b)). Jittable / vmappable."""
        M = self.n_terms
        T = self.interp_matrix[:M, :M]
        if self.triangular:
            return jax.scipy.linalg.solve_triangular(
                T, g_at_points, lower=True, unit_diagonal=True,
            )
        return jnp.linalg.solve(T, g_at_points)

    def error_indicator(self, g_at_all_points: jax.Array) -> jax.Array:
        """A-posteriori interpolation-error indicator from field values
        at ALL M + n_reserve magic points ((M+R,) or (M+R, b)):
        ``max_j |g(p_{M+j}) - I_M[g](p_{M+j})|`` over the reserve
        points. A rigorous LOWER bound on the sup-norm error (it IS the
        error at specific points); scalar (or (b,)). Jittable."""
        assert self.n_reserve > 0, "built without reserve terms"
        M = self.n_terms
        theta = self.coefficients(g_at_all_points[:M])
        pred = jnp.matmul(self.interp_matrix[M:, :M], theta, precision=_HI)
        return jnp.max(jnp.abs(g_at_all_points[M:] - pred), axis=0)

    def truncate(self, n_terms: int, n_reserve: int = 0) -> "EimInterpolant":
        """First ``n_terms`` active terms (+ the next ``n_reserve`` as
        reserve). For the EIM greedy this equals re-running it with
        ``max_terms=n_terms`` (the greedy is hierarchical)."""
        tot = n_terms + n_reserve
        assert tot <= self.basis.shape[1]
        return EimInterpolant(
            basis=self.basis[:, :tot], points=self.points[:tot],
            interp_matrix=self.interp_matrix[:tot, :tot],
            triangular=self.triangular,
            sup_errors=self.sup_errors[: tot + 1],
            n_reserve=n_reserve,
            snapshot_ids=self.snapshot_ids[:tot],
        )

    def interpolate(self, g: jax.Array) -> jax.Array:
        """Interpolate full field snapshots g (n,) or (n, b)."""
        return self.reconstruct(self.coefficients(g[self.active_points]))

    def reconstruct(self, theta: jax.Array) -> jax.Array:
        M = self.n_terms
        return jnp.matmul(self.basis[:, :M], theta, precision=_HI)


def eim_greedy(
    G,
    tol: float = 1e-8,
    max_terms: Optional[int] = None,
    relative: bool = True,
    reserve: int = 0,
) -> EimInterpolant:
    """EIM greedy over training snapshots G (n, m_train).

    Stops when the worst training-snapshot sup-norm interpolation error
    drops below ``tol`` (relative to the largest snapshot sup-norm when
    ``relative``, absolute otherwise) or at ``max_terms``. The basis is
    residual-normalized (unit value at its own magic point), making
    ``interp_matrix`` unit lower triangular — the classic EIM invariant
    that also bounds the Lebesgue constant growth.

    ``reserve > 0`` keeps the greedy running ``reserve`` extra steps past
    the stopping criterion; the extra magic points are NOT used for
    interpolation but feed :meth:`EimInterpolant.error_indicator` (the
    next-points a-posteriori estimate).

    The residual update is the exact rank-1 EIM recursion
    ``R -= b_M R[p_M, :]`` (the new basis vector vanishes at all earlier
    magic points), so each step costs one O(n·m) axpy — not a re-solve.
    """
    G = jnp.asarray(G)
    n, m = G.shape
    hard_cap = min(n, m)
    max_terms = hard_cap if max_terms is None else min(max_terms, hard_cap)
    scale = float(jnp.max(jnp.abs(G))) if relative else 1.0
    scale = scale if scale > 0 else 1.0

    basis_cols: list[jnp.ndarray] = []
    points: list[int] = []
    snap_ids: list[int] = []
    history: list[float] = []
    n_active: Optional[int] = None
    R = G  # interpolation residuals of ALL training snapshots
    while True:
        err_per_snap = jnp.max(jnp.abs(R), axis=0)
        j = int(jnp.argmax(err_per_snap))
        sup = float(err_per_snap[j])
        history.append(sup)
        if n_active is None and (sup <= tol * scale
                                 or len(points) >= max_terms):
            n_active = len(points)
        if n_active is not None:
            # sup == 0: the residual is exactly zero, no point can grow
            if len(points) >= n_active + reserve or sup == 0.0 \
                    or len(points) >= hard_cap:
                break
        r = R[:, j]
        p = int(jnp.argmax(jnp.abs(r)))
        b = r / r[p]
        basis_cols.append(b)
        points.append(p)
        snap_ids.append(j)
        # exact rank-1 interpolation-residual update: I_M[g] =
        # I_{M-1}[g] + (g - I_{M-1}[g])(p_M) b_M, and b vanishes at all
        # earlier magic points (keeps R[points, :] == 0 exactly)
        R = R - b[:, None] * R[p, :]

    if not points:  # zero field: a single arbitrary point, zero basis
        basis_cols = [jnp.zeros((n,), G.dtype)]
        points = [0]
        snap_ids = [0]
        n_active = 1
    B = jnp.stack(basis_cols, axis=1)
    pts = jnp.asarray(points, jnp.int32)
    return EimInterpolant(
        basis=B, points=pts, interp_matrix=B[pts, :], triangular=True,
        sup_errors=tuple(history),
        n_reserve=len(points) - (n_active if n_active is not None
                                 else len(points)),
        snapshot_ids=tuple(snap_ids),
    )


@partial(jax.jit, static_argnums=(1,))
def eim_greedy_scan(G, n_steps: int):
    """Fully-device fixed-shape EIM greedy: exactly ``n_steps`` steps as
    one ``lax.scan`` — zero host syncs (the host loop pays two argmax
    transfers per step, which dominates on a remote-dispatch TPU).
    Returns ``(basis (n, K), points (K,), snapshot_ids (K,), sups (K,),
    R (n, m))`` where ``sups[k]`` is the training sup error BEFORE adding
    term k+1 and ``R`` is the final residual carry (pass it back in to
    continue the greedy — ``eim_greedy_device`` chunks this way).

    Steps past an exactly-zero residual produce zero columns with
    ``sups == 0`` — truncate on the host (``eim_greedy_device`` does).

    Shards: pass G placed with a DoF-axis ``NamedSharding`` and the same
    program runs under GSPMD (argmax/take become collectives), returning
    a DoF-sharded basis — bit-identical to the unsharded scan (tested).
    Pod-scale non-affine offline therefore runs fully sharded.
    """
    G = jnp.asarray(G)

    def step(R, _):
        err = jnp.max(jnp.abs(R), axis=0)
        j = jnp.argmax(err)
        r = jnp.take(R, j, axis=1)
        p = jnp.argmax(jnp.abs(r))
        rp = jnp.take(r, p)
        b = r / jnp.where(rp == 0, jnp.ones((), R.dtype), rp)
        R = R - b[:, None] * jnp.take(R, p, axis=0)[None, :]
        return R, (b, p.astype(jnp.int32), j.astype(jnp.int32), err[j])

    R, (B, pts, ids, sups) = jax.lax.scan(step, G, None, length=n_steps)
    return B.T, pts, ids, sups, R


def eim_greedy_device(
    G,
    tol: float = 1e-8,
    max_terms: Optional[int] = None,
    relative: bool = True,
    reserve: int = 0,
    chunk: int = 32,
) -> EimInterpolant:
    """:func:`eim_greedy` semantics computed by the device scan
    (:func:`eim_greedy_scan`): the greedy runs in fixed-shape
    ``chunk``-step scan programs (ONE compile, reused), with one host
    transfer of the chunk's sup history between chunks to stop early —
    at most ``chunk - 1`` wasted steps vs the host loop's two transfers
    per step. Selections match the host greedy in exact arithmetic (same
    argmax tie-breaking, same tol/reserve/max_terms truncation;
    bit-equal at f64 — tested). At f32, scan-vs-loop reduction-order
    noise can flip a late argmax and the paths diverge from there; both
    remain valid greedies with the same certified-history semantics.
    Prefer at pod scale / on TPU where per-step host syncs dominate."""
    G = jnp.asarray(G)
    n, m = G.shape
    hard_cap = min(n, m)
    max_terms = hard_cap if max_terms is None else min(max_terms, hard_cap)
    budget = min(max_terms + reserve, hard_cap)
    chunk = max(1, min(chunk, budget))

    Bs_l, pts_l, ids_l, sups_l = [], [], [], []
    R = G
    done = 0
    scale = None
    while done < budget:
        steps = min(chunk, budget - done)
        B, pts, ids, sups, R = eim_greedy_scan(R, steps)
        sups_h = np.asarray(sups)
        Bs_l.append(B)
        pts_l.append(np.asarray(pts))
        ids_l.append(np.asarray(ids))
        sups_l.append(sups_h)
        done += steps
        if scale is None:  # residual at step 0 is G: sups[0] = max|G|
            scale = float(sups_h[0]) if relative else 1.0
            scale = scale if scale > 0 else 1.0
        # stop once tol is certified with the reserve steps in hand (or
        # the residual is exactly zero — nothing more can be selected)
        all_sups = np.concatenate(sups_l)
        below = np.nonzero(all_sups <= tol * scale)[0]
        if below.size and done >= min(int(below[0]) + reserve, budget):
            break
        if sups_h[-1] == 0.0:
            break

    sups_h = np.concatenate(sups_l)
    B = jnp.concatenate(Bs_l, axis=1) if len(Bs_l) > 1 else Bs_l[0]
    pts = np.concatenate(pts_l)
    ids = np.concatenate(ids_l)

    if not np.any(np.abs(sups_h) > 0):  # zero field
        return EimInterpolant(
            basis=jnp.zeros((n, 1), G.dtype),
            points=jnp.zeros((1,), jnp.int32),
            interp_matrix=jnp.zeros((1, 1), G.dtype),
            triangular=True, sup_errors=(0.0,), snapshot_ids=(0,),
        )
    below = np.nonzero(sups_h <= tol * scale)[0]
    n_active = min(int(below[0]) if below.size else max_terms, max_terms)
    # reserve steps must carry real (nonzero-residual) information
    nz = np.nonzero(sups_h > 0)[0]
    last_real = int(nz[-1]) + 1
    total = min(n_active + reserve, budget, last_real)
    if total == 0:  # tol met before any term: the host's zero fallback
        return EimInterpolant(
            basis=jnp.zeros((n, 1), G.dtype),
            points=jnp.zeros((1,), jnp.int32),
            interp_matrix=jnp.zeros((1, 1), G.dtype),
            triangular=True, sup_errors=(float(sups_h[0]),),
            snapshot_ids=(0,),
        )
    # the host greedy's history also logs the error AFTER the last term
    # (its final break iteration): sups_h[total] when the scan ran past
    # total, else the final carry residual's sup
    if total < len(sups_h):
        tail = float(sups_h[total])
    else:
        tail = float(jnp.max(jnp.abs(R)))
    Bs = B[:, :total]
    ps = jnp.asarray(pts[:total])
    return EimInterpolant(
        basis=Bs, points=ps, interp_matrix=Bs[ps, :], triangular=True,
        sup_errors=tuple(sups_h[:total].tolist()) + (tail,),
        n_reserve=total - n_active,
        snapshot_ids=tuple(int(i) for i in ids[:total]),
    )


def eim_rebuild(G_sel, n_reserve: int = 0) -> EimInterpolant:
    """EIM construction with a PRESCRIBED snapshot sequence (two-grid /
    two-stage EIM): column k of ``G_sel`` (n, K) is the snapshot the
    greedy selects at step k; each step's magic point is the argmax of
    that snapshot's current interpolation residual.

    Use case: run :func:`eim_greedy` on a CHEAP surrogate of the field
    family (a coarse grid), then rebuild the interpolant on the fine
    grid from only the K selected snapshots — the expensive part of the
    greedy (tracking ALL training residuals) happens once, coarse. The
    ``sup_errors`` history records each selected snapshot's residual
    sup-norm (a diagnostic on the selected subset only, not a certified
    training error — certify on the coarse greedy / a validation set).

    The last ``n_reserve`` columns become certification-only reserve
    terms, as in ``eim_greedy(reserve=...)``.
    """
    G_sel = jnp.asarray(G_sel)
    n, K = G_sel.shape
    assert 0 <= n_reserve < K
    basis_cols: list[jnp.ndarray] = []
    points: list[int] = []
    history: list[float] = []
    R = G_sel
    for k in range(K):
        r = R[:, k]
        p = int(jnp.argmax(jnp.abs(r)))
        sup = float(jnp.abs(r[p]))
        history.append(sup)
        assert sup > 0, (
            f"two-grid rebuild: selected snapshot {k} is exactly "
            "interpolated by its predecessors on the fine grid — drop it"
        )
        b = r / r[p]
        basis_cols.append(b)
        points.append(p)
        R = R - b[:, None] * R[p, :]
    B = jnp.stack(basis_cols, axis=1)
    pts = jnp.asarray(points, jnp.int32)
    return EimInterpolant(
        basis=B, points=pts, interp_matrix=B[pts, :], triangular=True,
        sup_errors=tuple(history), n_reserve=n_reserve,
    )


def theta_coefficients(interpolant: EimInterpolant, entries_fn,
                       name: str = "eim_theta"):
    """Tuple of ``ExpressionCoefficient`` theta_q(mu) for an affine
    surrogate built from ``interpolant``: ``entries_fn(mu) -> (M,)``
    evaluates the underlying quantity at the ACTIVE magic points
    (jittable), and all M coefficients share ONE memoized triangular
    solve per mu object (``eval_coefficients`` calls term coefficients
    independently; the cache is keyed on mu leaf identity with strong
    refs, so new arrays/tracers always miss)."""
    from rla4mor_tpu.core.parameters import ExpressionCoefficient

    cache: dict = {}

    def theta_full(mu):
        key = tuple(id(v) for v in jax.tree.leaves(mu))
        if cache.get("key") == key:
            return cache["theta"]
        theta = interpolant.coefficients(jnp.asarray(entries_fn(mu)))
        cache["key"] = key
        cache["refs"] = jax.tree.leaves(mu)
        cache["theta"] = theta
        return theta

    def theta_at(mu, q):
        return theta_full(mu)[q]

    return tuple(
        ExpressionCoefficient(partial(theta_at, q=q), name=f"{name}[{q}]")
        for q in range(interpolant.n_terms)
    )


class MdeimOperator:
    """Matrix-DEIM (Negri/Manzoni/Amsallem 2015): an affine surrogate of
    a NON-affine parametric SPARSE operator ``A(mu)``, built by the EIM
    greedy on the shared-sparsity-pattern nnz data vectors of operator
    snapshots — the host-FEM-path companion of the stencil families'
    :class:`~rla4mor_tpu.models.stencil_nonaffine.EimStencilFOM`
    (beyond reference: the reference is affine-only).

        A(mu) ~= sum_q theta_q(mu) A_q,
        theta(mu) = T^{-1} [A(mu)]_{magic nnz positions}

    Online theta needs only the M ACTIVE magic matrix ENTRIES — rows and
    cols ``magic_rows[:n_terms]`` / ``magic_cols[:n_terms]`` (the arrays
    hold M + n_reserve positions: the trailing reserve entries feed the
    same a-posteriori indicator as EIM and are NOT part of theta).
    Offline/host object (scipy sparse), per the repo's offline/online
    split (docs/DESIGN.md §4)."""

    def __init__(self, interpolant: EimInterpolant, indices, indptr,
                 shape):
        self.interpolant = interpolant
        self.indices = np.asarray(indices)
        self.indptr = np.asarray(indptr)
        self.shape = tuple(shape)
        pts = np.asarray(interpolant.points)
        self.magic_cols = self.indices[pts]
        self.magic_rows = (
            np.searchsorted(self.indptr, pts, side="right") - 1
        ).astype(self.magic_cols.dtype)

    @property
    def n_terms(self) -> int:
        return self.interpolant.n_terms

    def term_matrix(self, q: int):
        """Sparse term A_q (csr) with the shared pattern and the q-th
        EIM basis vector as data."""
        import scipy.sparse as sps

        return sps.csr_matrix(
            (np.asarray(self.interpolant.basis[:, q]), self.indices,
             self.indptr), shape=self.shape,
        )

    def entries_from_matrix(self, A) -> np.ndarray:
        """A(mu)'s values at ALL magic positions (active + reserve).
        ``A`` must carry the shared sparsity pattern."""
        Ac = _canonical_csr(A)
        return np.asarray(Ac.data)[np.asarray(self.interpolant.points)]

    def theta_from_matrix(self, A) -> jnp.ndarray:
        e = self.entries_from_matrix(A)[: self.n_terms]
        return self.interpolant.coefficients(jnp.asarray(e))

    def indicator_from_matrix(self, A) -> float:
        """A-posteriori estimate of ``max_nnz |A(mu) - A_MDEIM(mu)|``
        (reserve-entry interpolation error; rigorous lower bound)."""
        return float(self.interpolant.error_indicator(
            jnp.asarray(self.entries_from_matrix(A))
        ))

    def assemble(self, theta):
        """A_MDEIM = sum_q theta_q A_q as one csr."""
        import scipy.sparse as sps

        M = self.n_terms
        data = np.asarray(jnp.matmul(
            self.interpolant.basis[:, :M], jnp.asarray(theta),
            precision=_HI,
        ))
        return sps.csr_matrix((data, self.indices, self.indptr),
                              shape=self.shape)

    def affine_op(self, entries_fn):
        """``core.affine.AffineOp`` over ``HostSparseOp`` terms with
        shared-solve theta coefficients; ``entries_fn(mu) -> (M,)``
        evaluates the ACTIVE magic matrix entries
        (``magic_rows[:n_terms]`` / ``magic_cols[:n_terms]`` — e.g. M
        local FEM element assemblies, O(M), grid-independent). Cached
        per ``entries_fn`` identity: coefficient identity is the
        jit-cache key (same rationale as EimStencilFOM)."""
        cached = getattr(self, "_affine_cache", None)
        if cached is not None and cached[0] is entries_fn:
            return cached[1]
        from rla4mor_tpu.core.affine import AffineOp
        from rla4mor_tpu.core.linops import HostSparseOp

        op = AffineOp(
            tuple(HostSparseOp(self.term_matrix(q))
                  for q in range(self.n_terms)),
            theta_coefficients(self.interpolant, entries_fn,
                               name="mdeim_theta"),
        )
        self._affine_cache = (entries_fn, op)
        return op


def _canonical_csr(A):
    """CSR with sorted indices, WITHOUT mutating the caller's matrix
    (``A.tocsr()`` returns A itself when already CSR, and an in-place
    ``sort_indices`` would permute user-owned data/indices arrays)."""
    Ac = A.tocsr()
    if not Ac.has_sorted_indices:
        Ac = Ac.copy()
        Ac.sort_indices()
    return Ac


def mdeim(
    mats,
    tol: float = 1e-8,
    max_terms: Optional[int] = None,
    reserve: int = 0,
) -> MdeimOperator:
    """Build an :class:`MdeimOperator` from operator snapshots ``mats``
    (scipy sparse, all on the SAME sparsity pattern — assemble with
    identical structure, e.g. fixed FEM mesh/quadrature)."""
    base = _canonical_csr(mats[0])
    datas = []
    for A in mats:
        Ac = _canonical_csr(A)
        assert Ac.shape == base.shape and \
            np.array_equal(Ac.indices, base.indices) and \
            np.array_equal(Ac.indptr, base.indptr), \
            "mdeim: operator snapshots must share one sparsity pattern"
        datas.append(np.asarray(Ac.data))
    G = jnp.asarray(np.stack(datas, axis=1))
    interp = eim_greedy(G, tol=tol, max_terms=max_terms, reserve=reserve)
    return MdeimOperator(interp, base.indices, base.indptr, base.shape)


def deim_points(U) -> jnp.ndarray:
    """DEIM greedy point selection for an orthonormal-ish basis U (n, M):
    point l is the argmax of the l-th basis vector's interpolation
    residual w.r.t. the first l-1 vectors/points."""
    U = jnp.asarray(U)
    n, M = U.shape
    pts = [int(jnp.argmax(jnp.abs(U[:, 0])))]
    for l in range(1, M):
        Ul = U[:, :l]
        pl = jnp.asarray(pts, jnp.int32)
        c = jnp.linalg.solve(Ul[pl, :], U[pl, l])
        r = U[:, l] - jnp.matmul(Ul, c, precision=_HI)
        pts.append(int(jnp.argmax(jnp.abs(r))))
    return jnp.asarray(pts, jnp.int32)


def deim(
    G,
    modes: Optional[int] = None,
    rtol: Optional[float] = 1e-7,
) -> EimInterpolant:
    """DEIM interpolant from snapshots G (n, m_train): POD basis
    (method-of-snapshots, ``core.orthonormalize.pod``) + greedy points.

    ``rtol`` truncates the POD at ``rtol * s_0`` — it must stay above the
    Gram-squaring noise floor (~sqrt(eps) ≈ 1e-8 in f64, the reason
    ``pod`` itself defaults to 1e-7): magic points picked on noise modes
    build a meaningless interpolation system. An explicit ``modes``
    count disables the rtol truncation (the caller's choice wins)."""
    from rla4mor_tpu.core.orthonormalize import pod

    if modes is not None:
        rtol = None
    U, svals = pod(jnp.asarray(G), modes=modes, rtol=rtol)
    assert U.shape[1] > 0, "deim: snapshots have zero numerical rank"
    pts = deim_points(U)
    return EimInterpolant(
        basis=U, points=pts, interp_matrix=U[pts, :], triangular=False,
        sup_errors=tuple(np.asarray(svals).tolist()),
    )
