from . import pipeline  # registers transforms
from .sunrgbd import (SUNRGBDDataset, SyntheticSUNRGBD, RepeatDataset,
                      SUNRGBD_CLASSES)
from .loader import DataLoader, build_dataloader, collate_fixed
from ..utils.registry import DATASETS, build_from_cfg


def build_dataset(cfg):
    return build_from_cfg(cfg, DATASETS)
