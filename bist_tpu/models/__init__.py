from bist_tpu.models.model import (
    init_model, apply_model, encode, build_masks, precompute_decode_ctx,
    decode_step,
)
