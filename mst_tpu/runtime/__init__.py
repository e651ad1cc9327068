from mst_tpu.runtime.train import (  # noqa: F401
    Batch, TrainState, batch_from_song, create_train_state, make_train_step,
    make_lr_schedule,
)
