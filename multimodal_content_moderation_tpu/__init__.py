"""multimodal_content_moderation_tpu — a TPU-native multi-modal content
moderation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
``amirhossein-yousefi/multimodal-content-moderation`` (PyTorch/HF): dual-encoder
(CLIP / SigLIP) hateful-content classification with gated late-fusion and
multi-task heads, trained and served on TPU device meshes.

Layer map (TPU-first, not a port):

- ``ops``       pure-JAX + Pallas compute primitives (attention, patchify,
                normalization, losses)
- ``models``    functional encoder/heads as parameter pytrees + HF checkpoint
                converters
- ``data``      host-side tokenization, image decode/resize, double-buffered
                device prefetch
- ``parallel``  mesh construction, sharding rules, collectives
- ``training``  pjit train/eval loops, optimizers, metrics, checkpoints
- ``cli``       train/evaluate/inference/prepare_data entry points (flag and
                artifact compatible with the reference ``scripts/*.py``)
- ``serving``   JSON serving handler mirroring the reference SageMaker contract
"""

__version__ = "0.1.0"

from multimodal_content_moderation_tpu.utils.config import (  # noqa: F401
    load_config,
    merge_configs,
    parse_label_list,
    save_json,
    load_json,
)
