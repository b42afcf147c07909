from .mesh import make_mesh
from .multiseq import MultiSeqTracker

__all__ = ["make_mesh", "MultiSeqTracker"]
