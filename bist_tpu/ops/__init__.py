from bist_tpu.ops.flash_attention import flash_attention, attention_reference
