from .mesh import (make_mesh, make_space_mesh, parse_mesh_spec,
                   shard_model_inputs, sharded_scan, space_chunk_spec,
                   space_state_spec)

__all__ = ["make_mesh", "make_space_mesh", "parse_mesh_spec",
           "shard_model_inputs", "sharded_scan", "space_chunk_spec",
           "space_state_spec"]
