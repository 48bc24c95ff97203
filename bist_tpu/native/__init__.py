from bist_tpu.native.loader import (
    native_available, assemble_feature_batch, probe_npy_shape,
)
