from salience_detr_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from salience_detr_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
