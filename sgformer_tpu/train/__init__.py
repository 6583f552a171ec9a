from sgformer_tpu.train.optim import adam, dual_weight_decay_adam  # noqa: F401
from sgformer_tpu.train.logger import RunLogger  # noqa: F401
from sgformer_tpu.train.trainer import TrainConfig, Trainer  # noqa: F401
from sgformer_tpu.train.batch_trainer import (  # noqa: F401
    BatchTrainConfig,
    BatchTrainer,
    build_subgraph_batch,
)
from sgformer_tpu.train.sampled_trainer import (  # noqa: F401
    SampledTrainConfig,
    SampledTrainer,
)
from sgformer_tpu.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
