from .bts import BtsModel, BtsConfig

__all__ = ["BtsModel", "BtsConfig"]
