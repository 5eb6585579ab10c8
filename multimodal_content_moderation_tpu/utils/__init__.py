from multimodal_content_moderation_tpu.utils.compile_cache import (  # noqa: F401
    enable_compilation_cache,
    maybe_enable_from_env,
)
from multimodal_content_moderation_tpu.utils.config import (  # noqa: F401
    ensure_dir,
    infer_size,
    load_config,
    load_json,
    merge_configs,
    parse_label_list,
    save_json,
    setup_logging,
)
