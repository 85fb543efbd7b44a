from rangeldm_tpu.ops.attention import (  # noqa: F401
    attention_mh_fused, fused_attention, fused_attention_t,
)
