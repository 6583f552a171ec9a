from sgformer_tpu.train.optim import dual_weight_decay_adam  # noqa: F401
from sgformer_tpu.train.logger import RunLogger  # noqa: F401
from sgformer_tpu.train.trainer import TrainConfig, Trainer  # noqa: F401
