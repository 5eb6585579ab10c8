from multimodal_content_moderation_tpu.models.clip import (  # noqa: F401
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_image_features,
    clip_init,
    clip_text_features,
    clip_text_pooled,
    clip_vision_pooled,
)
from multimodal_content_moderation_tpu.models.siglip import (  # noqa: F401
    SigLIPConfig,
    SigLIPTextConfig,
    SigLIPVisionConfig,
    siglip_image_features,
    siglip_init,
    siglip_text_features,
)
from multimodal_content_moderation_tpu.models.generic import (  # noqa: F401
    GenericDualConfig,
    GenericTextConfig,
    GenericVisionConfig,
    generic_image_features,
    generic_init,
    generic_text_features,
)
from multimodal_content_moderation_tpu.models.fusion import (  # noqa: F401
    FusionModel,
    fusion_head_apply,
    fusion_head_init,
)
from multimodal_content_moderation_tpu.models.multitask import (  # noqa: F401
    MultiTaskModel,
    mtl_head_apply,
    mtl_head_init,
)
