from multimodal_content_moderation_tpu.ops.layers import (  # noqa: F401
    dense,
    dropout,
    gelu_tanh,
    layer_norm,
    mha,
    patchify,
    quick_gelu,
)
from multimodal_content_moderation_tpu.ops.losses import (  # noqa: F401
    asymmetric_loss,
    bce_with_logits,
    focal_with_logits,
)
