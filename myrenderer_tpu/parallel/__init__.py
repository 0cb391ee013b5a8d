from .sharding import make_mesh, sharded_render_step

__all__ = ["make_mesh", "sharded_render_step"]
