from .image_io import read_ppm, write_png, write_ppm
from .render import Renderer, render_scene

__all__ = ["Renderer", "render_scene", "read_ppm", "write_png", "write_ppm"]
