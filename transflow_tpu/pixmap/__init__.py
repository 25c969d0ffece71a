from .base import PixmapSource

__all__ = ["PixmapSource"]
