from .mesh import (make_mesh, make_mesh_for_batch, shard_batch, replicate,
                   data_sharding)
