from .native import FramePipeline, native_available

__all__ = ["FramePipeline", "native_available"]
