from tpusparse.grid.grid3d import Grid3D

__all__ = ["Grid3D"]
