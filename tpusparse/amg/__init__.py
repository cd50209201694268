from tpusparse.amg.hierarchy import AMGParams, Hierarchy, gamg_setup, vcycle

__all__ = ["AMGParams", "Hierarchy", "gamg_setup", "vcycle"]
