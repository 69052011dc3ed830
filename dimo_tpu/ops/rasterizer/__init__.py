from dimo_tpu.ops.rasterizer.api import rasterize, rasterize_dense, RenderOutput  # noqa: F401
from dimo_tpu.ops.rasterizer.tiles import TILE_H, TILE_W  # noqa: F401
