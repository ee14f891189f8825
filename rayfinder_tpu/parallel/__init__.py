from .sharding import make_render_mesh, render_step_sharded, render_image_sharded

__all__ = ["make_render_mesh", "render_step_sharded", "render_image_sharded"]
