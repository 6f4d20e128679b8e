from kytpu.dist.mesh import make_mesh, default_mesh_shape
from kytpu.dist.shard import render_sharded, render_sharded_pallas, render_tiles

__all__ = ["make_mesh", "default_mesh_shape", "render_sharded", "render_sharded_pallas", "render_tiles"]
