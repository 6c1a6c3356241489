from .config import Config, ConfigDict, DictAction
from .registry import (Registry, build_from_cfg, DETECTORS, BACKBONES, NECKS,
                       HEADS, LOSSES, BBOX_CODERS, SA_MODULES,
                       TRANSFORMER_LAYERS, POSITIONAL_ENCODINGS,
                       FUSION_LAYERS, DATASETS, PIPELINES,
                       build_detector, build_backbone, build_neck, build_head,
                       build_loss, build_bbox_coder, build_sa_module,
                       build_transformer_layer, build_positional_encoding)
