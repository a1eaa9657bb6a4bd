from vgpmp_tpu.parallel.mesh import make_mesh, init_distributed
from vgpmp_tpu.parallel.sharded import make_sharded_solver, pad_problems

__all__ = ["make_mesh", "init_distributed", "make_sharded_solver", "pad_problems"]
