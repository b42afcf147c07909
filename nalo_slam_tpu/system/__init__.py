from .full_system import FullSystem, FrameShell
from .pipeline import PipelinedSystem

__all__ = ["FullSystem", "FrameShell", "PipelinedSystem"]
