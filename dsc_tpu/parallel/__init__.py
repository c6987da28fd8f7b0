from .mesh import make_mesh
from .sharded_fft import distributed_fft, shard_batch, sharded_batched_fft

__all__ = ['make_mesh', 'shard_batch', 'sharded_batched_fft', 'distributed_fft']
