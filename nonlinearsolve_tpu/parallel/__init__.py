from .mesh import create_mesh, replicated, row_sharding
from .distributed import (distributed_solve, halo_exchange,
                          psum_dot_factory, sharded_laplacian_1d_factory,
                          sharded_rd3d_jvp_factory,
                          sharded_rd3d_jvp_pallas_factory)
from .sparse_dist import build_sharded_csr_plan, make_sharded_csr_matvec
