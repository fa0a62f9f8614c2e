"""Sparse-engine facade: selects the dense-index-grid engine (default; no
device sorts — see ops.sparse_grid) or the searchsorted engine
(ops.sparse; exact-ordering oracle, fine on CPU). Override with
DAL3D_SPARSE_ENGINE=sorted|grid."""
import os

from .sparse import SparseBatch, gather_gemm, to_dense  # shared

_ENGINE = os.environ.get("DAL3D_SPARSE_ENGINE", "grid")

if _ENGINE == "sorted":
    from .sparse import (
        from_voxels, subm_rulebook, subm_conv, sparse_conv_downsample, downsample_plan,
    )
else:
    from .sparse_grid import (
        from_voxels, subm_rulebook, subm_conv, sparse_conv_downsample, downsample_plan,
        build_index_grid,
    )

__all__ = [
    "SparseBatch", "gather_gemm", "to_dense", "from_voxels", "subm_rulebook",
    "subm_conv", "sparse_conv_downsample", "downsample_plan",
]
