from .mesh import make_mesh, shard_model_inputs, sharded_scan

__all__ = ["make_mesh", "shard_model_inputs", "sharded_scan"]
