"""Device memory telemetry — the TPU-native replacement for the
reference's ``nvidia-smi`` subprocess poll (``get_gpu_memory_map``,
``/root/reference/medium/main.py:23-39`` and
``large/data_utils.py:263-298``, defined twice there)."""

from __future__ import annotations

from typing import Optional

import jax


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """{'bytes_in_use', 'peak_bytes_in_use', 'bytes_limit', ...} for one
    device (empty dict on backends without memory_stats, e.g. CPU)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats()
    return dict(stats) if stats else {}


def memory_mb(device: Optional[jax.Device] = None) -> float:
    """Current bytes-in-use in MiB (the number the reference's benchmark
    records per run)."""
    return device_memory_stats(device).get("bytes_in_use", 0) / 2**20
