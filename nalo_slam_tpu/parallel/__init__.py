from .mesh import make_mesh
from .multiseq import MultiSeqTracker, MultiSeqSystem

__all__ = ["make_mesh", "MultiSeqTracker", "MultiSeqSystem"]
