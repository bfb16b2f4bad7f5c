from feartracker_tpu.core import box_coder, geometry, geometry_jax, grids, postprocess

__all__ = ["box_coder", "geometry", "geometry_jax", "grids", "postprocess"]
