from tpusparse.kernels.stencil7 import star7_mv_pallas, star7_supported

__all__ = ["star7_mv_pallas", "star7_supported"]
