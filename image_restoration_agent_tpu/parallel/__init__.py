from .mesh import make_mesh, local_mesh
from .tile_parallel import tiled_apply_sharded
from .halo_tiling import tiled_apply_halo, halo_pad_height
from .train_step import make_train_state, make_sharded_train_step

__all__ = [
    "make_mesh", "local_mesh",
    "tiled_apply_sharded", "tiled_apply_halo", "halo_pad_height",
    "make_train_state", "make_sharded_train_step",
]
