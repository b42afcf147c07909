from .undistort import Undistorter
from .photometric import PhotometricUndistorter, GammaCalib
from .dataset import ImageFolderReader

__all__ = ["Undistorter", "PhotometricUndistorter", "GammaCalib", "ImageFolderReader"]
