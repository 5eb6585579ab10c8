from multimodal_content_moderation_tpu.data.dataset import (  # noqa: F401
    CSVDataset,
    collate,
)
from multimodal_content_moderation_tpu.data.tokenizer import (  # noqa: F401
    ClipBPETokenizer,
    load_tokenizer,
)
from multimodal_content_moderation_tpu.data.images import (  # noqa: F401
    ImagePreprocessor,
)
