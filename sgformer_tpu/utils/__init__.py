from sgformer_tpu.utils.memory import device_memory_stats  # noqa: F401
