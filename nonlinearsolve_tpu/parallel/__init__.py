from .mesh import create_mesh, replicated, row_sharding
from .distributed import (distributed_solve, halo_exchange,
                          psum_dot_factory, sharded_laplacian_1d_factory,
                          sharded_rd3d_jvp_factory,
                          sharded_rd3d_jvp_pallas_factory)
