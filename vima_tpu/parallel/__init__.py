from vima_tpu.parallel.mesh import make_mesh
from vima_tpu.parallel.sharding import param_shardings, data_sharding, replicated

__all__ = ["make_mesh", "param_shardings", "data_sharding", "replicated"]
