"""Native (C++) host-runtime components.

The TPU compute path is JAX/XLA/Pallas; the host runtime around it — here,
the image-decode/resample input pipeline — is native C++ reached over
ctypes. `sd_tpu.native.loader` is the public surface; everything degrades
gracefully to the PIL path in `sd_tpu.data.datasets` when the shared
library cannot be built (missing toolchain / headers).
"""

from sd_tpu.native.loader import (  # noqa: F401
    available,
    decode_resize,
    load_batch,
    library_path,
)
