from tpusparse.bench.driver import SolveReport, solve_poisson

__all__ = ["solve_poisson", "SolveReport"]
