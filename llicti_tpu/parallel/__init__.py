from .mesh import make_mesh, replicated, batch_sharding
from .train import make_parallel_train_step, shard_state
