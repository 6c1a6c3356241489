"""CLI argument surfaces (train/test), mirroring the reference's
``demf/engine/default.py`` flag sets so launch commands port over.
"""
from __future__ import annotations

import argparse

from ..utils.config import DictAction


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description='Train a 3D detector (TPU)')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--work-dir', help='dir to save logs and ckpts')
    parser.add_argument('--resume-from', help='checkpoint to resume from')
    parser.add_argument('--no-validate', action='store_true',
                        help='skip validation during training')
    group = parser.add_mutually_exclusive_group()
    group.add_argument('--gpus', type=int,
                       help='(compat) number of devices to use')
    group.add_argument('--gpu-ids', type=int, nargs='+',
                       help='(compat) ids of devices to use')
    parser.add_argument('--seed', type=int, default=0, help='random seed')
    parser.add_argument('--deterministic', action='store_true',
                        help='deterministic options (JAX is deterministic '
                             'by default modulo cross-replica reductions)')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        help='override config entries: key.path=value')
    parser.add_argument('--launcher',
                        choices=['none', 'pytorch', 'slurm', 'mpi', 'jax'],
                        default='none',
                        help='job launcher (multi-host: jax.distributed)')
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument('--autoscale-lr', action='store_true',
                        help='linear LR scaling by device count / 8')
    return parser.parse_args(argv)


def parse_args_test(argv=None):
    parser = argparse.ArgumentParser(description='Evaluate a 3D detector')
    parser.add_argument('config', help='test config file path')
    parser.add_argument('checkpoint', help='checkpoint file')
    parser.add_argument('--out', help='output result file (pickle)')
    parser.add_argument('--fuse-conv-bn', action='store_true',
                        help='fold BN into preceding dense/conv at load')
    parser.add_argument('--format-only', action='store_true')
    parser.add_argument('--eval', type=str, nargs='+', default=['mAP'],
                        help='evaluation metrics')
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--show-dir', help='dir to save visualizations')
    parser.add_argument('--gpu-collect', action='store_true',
                        help='(compat) results are gathered on device')
    parser.add_argument('--tmpdir', help='(compat) unused: no pickle gather')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction)
    parser.add_argument('--eval-options', nargs='+', action=DictAction)
    parser.add_argument('--launcher',
                        choices=['none', 'pytorch', 'slurm', 'mpi', 'jax'],
                        default='none')
    parser.add_argument('--local_rank', type=int, default=0)
    return parser.parse_args(argv)
