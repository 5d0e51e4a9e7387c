from .tiles import TileStack, build_tile_stack  # noqa: F401
