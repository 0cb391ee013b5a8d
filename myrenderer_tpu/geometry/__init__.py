from .triangulation import Triangulation, TriangulationError, triangulate
from .unirand import Unirand, unirand_seed

__all__ = [
    "Triangulation",
    "TriangulationError",
    "triangulate",
    "Unirand",
    "unirand_seed",
]
