from tpusparse.sparse.csr import HostCSR
from tpusparse.sparse.ell import ELL
from tpusparse.sparse.stencil import StarStencil3D

__all__ = ["HostCSR", "ELL", "StarStencil3D"]
