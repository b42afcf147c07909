from .interp import interp1, interp3
from .pyramid import build_pyramid

__all__ = ["interp1", "interp3", "build_pyramid"]
