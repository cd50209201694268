from tpusparse.solve.bcgs import bicgstab
from tpusparse.solve.chebyshev import chebyshev
from tpusparse.solve.bjacobi import BlockJacobi
from tpusparse.solve.cg import CGResult, ConvergedReason, cg, cg_hostloop
from tpusparse.solve.checkpoint import CheckpointConfig, cg_checkpointed
from tpusparse.solve.fgmres import fgmres
from tpusparse.solve.gmres import gmres
from tpusparse.solve.minres import minres
from tpusparse.solve.spectrum import ritz_values
from tpusparse.solve.multi import MultiResult, cg_multi, refined_multi
from tpusparse.solve.pipelined import cg_pipelined
from tpusparse.solve.refine import RefinedResult, cg_refined, cg_refined_tf
from tpusparse.solve.simple import preonly, richardson

__all__ = [
    "cg",
    "cg_hostloop",
    "cg_pipelined",
    "gmres",
    "fgmres",
    "minres",
    "ritz_values",
    "bicgstab",
    "chebyshev",
    "cg_refined",
    "cg_refined_tf",
    "cg_checkpointed",
    "cg_multi",
    "refined_multi",
    "MultiResult",
    "richardson",
    "preonly",
    "BlockJacobi",
    "CGResult",
    "ConvergedReason",
    "RefinedResult",
    "CheckpointConfig",
]
