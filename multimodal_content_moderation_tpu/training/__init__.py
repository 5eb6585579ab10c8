from multimodal_content_moderation_tpu.training.metrics import (  # noqa: F401
    calibrate_thresholds,
    compute_detailed_metrics,
    make_compute_metrics_mtl,
    make_compute_metrics_multi,
)
from multimodal_content_moderation_tpu.training.sampling import (  # noqa: F401
    build_multilabel_sample_weights,
    weighted_sample_indices,
)
from multimodal_content_moderation_tpu.training.optim import (  # noqa: F401
    build_optimizer,
)
