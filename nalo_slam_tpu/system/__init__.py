from .full_system import FullSystem, FrameShell

__all__ = ["FullSystem", "FrameShell"]
