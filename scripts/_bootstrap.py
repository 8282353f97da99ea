"""Put the repo root on sys.path so ``python scripts/<x>.py`` works
from any cwd without PYTHONPATH (direct script execution only adds
scripts/ itself).

``setup_jax_cache()`` (opt-in, called by the TPU bench/driver scripts)
points jax at a persistent compilation cache: TPU compiles ride a
remote-compile tunnel in this image (minutes for the large Pallas
kernels), so cache hits across bench/script runs are a big wall-clock
win.  It is NOT run on import — scripts that never touch jax should
not pay the import, and global config mutation should be visible at
the call site.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def setup_jax_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
