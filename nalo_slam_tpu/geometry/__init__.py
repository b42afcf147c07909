from .se3 import SE3
from . import lie
from .camera import PyramidCalib

__all__ = ["SE3", "lie", "PyramidCalib"]
