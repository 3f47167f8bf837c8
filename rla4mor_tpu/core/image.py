"""Image-space estimation for affine operators.

Replacement for pyMOR ``estimate_image`` as the reference uses it to build
the intermediate bases of the stable preconditioned-Galerkin assembly
(reference preconditioners/tests.py:382-384): an (R-)orthonormal basis of
span{ R^-1 A_j u : terms j, basis columns u } (+ rhs vectors).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from rla4mor_tpu.core.affine import as_affine
from rla4mor_tpu.core.orthonormalize import gram_schmidt
from rla4mor_tpu.core.products import Product


def estimate_image(
    operators: Sequence = (),
    vectors: Sequence = (),
    basis=None,
    product: Optional[Product] = None,
    riesz_representatives: bool = True,
    orthonormalize: bool = True,
):
    """Orthonormal basis of the affine image space.

    ``operators``: affine operators applied to ``basis`` columns;
    ``vectors``: affine rhs-like operators (source dim 1) contributing their
    term vectors. With ``riesz_representatives`` the columns are mapped
    through R^-1 first (reference tests.py:383-384 passes
    riesz_representatives=True).
    """
    cols = []
    for op in operators:
        for term in as_affine(op).terms:
            cols.append(jnp.asarray(term.apply(jnp.asarray(basis))))
    for v in vectors:
        for term in as_affine(v).terms:
            m = jnp.asarray(term.matrix())
            cols.append(m if m.ndim == 2 else m[:, None])
    X = jnp.concatenate(cols, axis=1)
    if riesz_representatives and product is not None:
        X = jnp.asarray(product.inv.apply(X))
    if not orthonormalize:
        return X
    Q, R = gram_schmidt(X, product=product, return_R=True)
    # drop the columns gram_schmidt zeroed (rank deficiency): R[j, j] == 0
    # marks them regardless of the product scaling, whereas an l2-norm
    # test misjudges R-normalized columns of a scaled product (round-2
    # review finding, repro'd with R = 1e4 * I)
    keep = jnp.abs(jnp.diagonal(R)) > 0.0
    return Q[:, keep]
