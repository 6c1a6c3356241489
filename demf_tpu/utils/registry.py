"""String-keyed registries resolving ``dict(type='Name', ...)`` configs.

This is the framework's public extension point (the reference registers every
component through mmcv registries: /root/reference/demf/modeling/detectors/
demfnet.py:12, .../class_agnostic_vote_head.py:24,335). The five reference
configs use the same ``type=`` strings, so they port verbatim.
"""
from __future__ import annotations

import inspect


class Registry:
    def __init__(self, name):
        self.name = name
        self._module_dict = {}

    def __contains__(self, key):
        return key in self._module_dict

    def __repr__(self):
        return f'Registry({self.name}, items={list(self._module_dict)})'

    def get(self, key):
        return self._module_dict.get(key)

    def register_module(self, name=None, module=None, force=False):
        if module is not None:
            self._register(module, name, force)
            return module

        def _decorator(cls):
            self._register(cls, name, force)
            return cls

        return _decorator

    def _register(self, module, name=None, force=False):
        if name is None:
            name = module.__name__
        names = [name] if isinstance(name, str) else list(name)
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f'{n} already registered in {self.name}')
            self._module_dict[n] = module

    def build(self, cfg, default_args=None):
        return build_from_cfg(cfg, self, default_args)


def build_from_cfg(cfg, registry, default_args=None):
    """Instantiate ``registry[cfg['type']](**cfg_without_type)``."""
    if cfg is None:
        return None
    import collections.abc
    if not isinstance(cfg, collections.abc.Mapping):
        raise TypeError(f'cfg must be a dict, got {type(cfg)}')
    if 'type' not in cfg:
        raise KeyError(f'cfg must contain the key "type": {cfg}')
    args = dict(cfg)
    obj_type = args.pop('type')
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f'{obj_type} is not registered in {registry.name}; '
                           f'available: {sorted(registry._module_dict)}')
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f'type must be str or class, got {type(obj_type)}')
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_cls(**args)


# Component registries mirroring the reference's registry split.
DETECTORS = Registry('detectors')
BACKBONES = Registry('backbones')
NECKS = Registry('necks')
HEADS = Registry('heads')
LOSSES = Registry('losses')
BBOX_CODERS = Registry('bbox_coders')
SA_MODULES = Registry('sa_modules')
TRANSFORMER_LAYERS = Registry('transformer_layers')
POSITIONAL_ENCODINGS = Registry('positional_encodings')
FUSION_LAYERS = Registry('fusion_layers')
DATASETS = Registry('datasets')
PIPELINES = Registry('pipelines')
MATCH_COSTS = Registry('match_costs')
BBOX_ASSIGNERS = Registry('bbox_assigners')


def build_detector(cfg, train_cfg=None, test_cfg=None):
    defaults = {}
    if train_cfg is not None:
        defaults['train_cfg'] = train_cfg
    if test_cfg is not None:
        defaults['test_cfg'] = test_cfg
    return build_from_cfg(cfg, DETECTORS, defaults or None)


def build_backbone(cfg):
    return build_from_cfg(cfg, BACKBONES)


def build_neck(cfg):
    return build_from_cfg(cfg, NECKS)


def build_head(cfg):
    return build_from_cfg(cfg, HEADS)


def build_loss(cfg):
    return build_from_cfg(cfg, LOSSES)


def build_bbox_coder(cfg):
    return build_from_cfg(cfg, BBOX_CODERS)


def build_sa_module(cfg):
    return build_from_cfg(cfg, SA_MODULES)


def build_transformer_layer(cfg):
    return build_from_cfg(cfg, TRANSFORMER_LAYERS)


def build_positional_encoding(cfg):
    return build_from_cfg(cfg, POSITIONAL_ENCODINGS)
