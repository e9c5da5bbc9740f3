from blurr_tpu.parallel.mesh import make_mesh, pi0_param_sharding

__all__ = ["make_mesh", "pi0_param_sharding"]
