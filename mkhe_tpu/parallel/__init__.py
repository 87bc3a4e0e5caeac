"""Device-mesh sharding (new in the TPU build; the reference is
single-threaded — SURVEY.md §2.3, §5.7-5.8)."""

from .mesh import (make_mesh, ciphertext_sharding, key_sharding,
                   shard_ciphertext, shard_rlk_stacked, shard_params)

__all__ = ["make_mesh", "ciphertext_sharding", "key_sharding",
           "shard_ciphertext", "shard_rlk_stacked", "shard_params"]
