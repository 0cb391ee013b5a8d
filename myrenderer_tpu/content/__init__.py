from .polygon import Polygon
from .terrain import Terrain

__all__ = ["Polygon", "Terrain"]
