from rla4mor_tpu.ops.fwht import fwht, srht, srht_rows, hadamard_matrix


def srht_pallas(*args, **kwargs):
    """Lazy import of the fused Pallas kernel (TPU-only dependency path)."""
    from rla4mor_tpu.ops.srht_pallas import srht_pallas as _impl

    return _impl(*args, **kwargs)


def srht_onepass_xla(*args, **kwargs):
    """Lazy import of the single-pass XLA-scan SRHT (same semantics)."""
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_xla as _impl

    return _impl(*args, **kwargs)


def srht_onepass_flat(*args, **kwargs):
    """Lazy import of the blocked-layout flat SRHT (row blocks (m, B, R))."""
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat as _impl

    return _impl(*args, **kwargs)


def srht_onepass_flat_cols(*args, **kwargs):
    """Lazy import of the columns-native flat SRHT ((n, m) snapshots)."""
    from rla4mor_tpu.ops.srht_pallas import srht_onepass_flat_cols as _impl

    return _impl(*args, **kwargs)
from rla4mor_tpu.ops.dims import gaussian_dim, srht_dim, resolve_dim
from rla4mor_tpu.ops.embeddings import (
    Embedding,
    GaussianEmbedding,
    RademacherEmbedding,
    SparseSignEmbedding,
    SrhtEmbedding,
    IdentityEmbedding,
    BlockGaussianEmbedding,
    StreamedGaussianEmbedding,
    HwPrngGaussianEmbedding,
    VectorizedEmbedding,
)

__all__ = [
    "fwht", "srht", "srht_rows", "hadamard_matrix",
    "gaussian_dim", "srht_dim", "resolve_dim",
    "Embedding", "GaussianEmbedding", "RademacherEmbedding",
    "SparseSignEmbedding", "SrhtEmbedding", "IdentityEmbedding",
    "StreamedGaussianEmbedding", "HwPrngGaussianEmbedding",
    "BlockGaussianEmbedding", "VectorizedEmbedding",
]
