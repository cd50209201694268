from tpusparse.solve.cg import CGResult, ConvergedReason, cg

__all__ = ["cg", "CGResult", "ConvergedReason"]
