from unimatch_tpu.parallel.mesh import make_mesh, replicated, batch_sharded
from unimatch_tpu.parallel.train import TrainState, create_train_state, make_train_step

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
