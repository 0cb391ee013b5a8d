from . import raster_common, raster_ref, vertex_stage

__all__ = ["raster_common", "raster_ref", "vertex_stage"]
