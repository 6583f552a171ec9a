from sgformer_tpu.utils.memory import device_memory_stats  # noqa: F401
from sgformer_tpu.utils.cache import enable_compilation_cache  # noqa: F401
from sgformer_tpu.utils.rng import train_key  # noqa: F401
