from msc_tpu.parallel.mesh import make_mesh, make_vlm_shardings

__all__ = ["make_mesh", "make_vlm_shardings"]
