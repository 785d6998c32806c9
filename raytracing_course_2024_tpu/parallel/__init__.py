from .shard import compile_sharded_renderer, make_mesh, render_frame_sharded

__all__ = ["compile_sharded_renderer", "make_mesh", "render_frame_sharded"]
