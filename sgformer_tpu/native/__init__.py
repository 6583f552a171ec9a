"""ctypes bindings for the native host kernels (csrc/graph_kernels.cpp).

Compiled lazily with g++ on first use and cached next to the package;
every entry point has a pure-numpy fallback, so environments without a
toolchain lose speed, not capability.
"""

from sgformer_tpu.native.build import get_lib, native_available  # noqa: F401
from sgformer_tpu.native.api import (  # noqa: F401
    fill_chunk_plan_native,
    sample_neighbors_native,
)
