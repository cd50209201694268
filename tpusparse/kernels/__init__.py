from tpusparse.kernels.stencil7 import (
    is_tpu_backend,
    padded_shape,
    star7_mv_padded,
    star7_mv_pallas,
    star7_supported,
)

__all__ = [
    "is_tpu_backend",
    "padded_shape",
    "star7_mv_padded",
    "star7_mv_pallas",
    "star7_supported",
]
