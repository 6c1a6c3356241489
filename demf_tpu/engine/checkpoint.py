"""Checkpoint save/restore (orbax) + warm-start key remapping.

Covers the reference's three load modes (SURVEY.md §5): ``resume_from``
(model+optimizer+epoch), ``load_from`` (params warm start), and eval-time
``load_checkpoint`` — plus the DeMF surgical remap that moves a pretrained
image branch's DETR encoder into ``img_encoder`` and drops the DETR decoder
(reference demfnet.py:85-101).
"""
from __future__ import annotations

import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir):
    return os.path.abspath(os.path.join(work_dir, 'checkpoints'))


def save_checkpoint(work_dir, state, epoch, keep=-1, meta=None):
    """Save train state under work_dir/checkpoints/<epoch>.

    ``meta`` (JSON-serializable dict) makes the checkpoint self-describing,
    mirroring the reference embedding of config text / CLASSES / versions
    into every checkpoint (reference train.py:127-137); it is written as a
    ``<ckpt>.meta.json`` sidecar (orbax payloads hold arrays, not strings)
    and read back by :func:`load_meta` (reference eval.py:90-98).
    """
    path = _ckpt_dir(work_dir)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(path, f'epoch_{epoch + 1}')
    payload = {'state': jax.device_get(state), 'epoch': epoch}
    ckptr.save(target, payload, force=True)
    ckptr.wait_until_finished()
    if meta:
        import json
        m = dict(meta)
        m['epoch'] = epoch
        with open(target + '.meta.json', 'w') as f:
            json.dump(m, f, indent=1)
    if keep and keep > 0:
        existing = sorted(
            (d for d in os.listdir(path)
             if re.fullmatch(r'epoch_\d+', d)
             and os.path.isdir(os.path.join(path, d))),
            key=lambda d: int(d.split('_')[1]))
        for d in existing[:-keep]:
            import shutil
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
            try:
                os.remove(os.path.join(path, d + '.meta.json'))
            except OSError:
                pass


def load_meta(ckpt_path):
    """Read the ``<ckpt>.meta.json`` sidecar (None if absent).

    The eval CLI uses this to recover CLASSES recorded at train time, the
    equivalent of the reference reading ``checkpoint['meta']['CLASSES']``
    (reference eval.py:90-98).
    """
    import json
    path = os.path.abspath(ckpt_path).rstrip('/') + '.meta.json'
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def latest_checkpoint(work_dir):
    path = _ckpt_dir(work_dir)
    if not os.path.isdir(path):
        return None
    epochs = [d for d in os.listdir(path) if re.fullmatch(r'epoch_\d+', d)]
    if not epochs:
        return None
    latest = max(epochs, key=lambda d: int(d.split('_')[1]))
    return os.path.join(path, latest)


def restore_checkpoint(path, state_template):
    """Restore (state, epoch) from an explicit checkpoint path."""
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(
        os.path.abspath(path),
        {'state': jax.device_get(state_template), 'epoch': 0})
    return payload['state'], payload['epoch']


def load_params(path, params_template=None, with_batch_stats=False):
    """Warm-start: restore params only (``load_from`` mode).

    Restores the raw checkpoint tree (so the caller needs no optimizer-state
    template) and extracts params (+ batch_stats when requested).
    """
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    state = payload['state']
    if with_batch_stats:
        return state['params'], state.get('batch_stats', {})
    return state['params']


def remap_img_branch_keys(params: Any) -> Any:
    """DeMF warm-start remap (reference demfnet.py:85-101).

    Moves ``img_bbox_head/transformer/{encoder,level_embeds}*`` subtrees to
    ``img_encoder/...`` and drops every other ``img_bbox_head`` entry (the
    pretrained DETR decoder/classifier are not used by DeMF).
    Operates on a nested dict of params.
    """
    flat = _flatten(params)
    out = {}
    for key, v in flat.items():
        if '/img_bbox_head/' not in '/' + key + '/':
            out[key] = v
            continue
        if 'encoder' in key or 'level_embeds' in key:
            new_key = re.sub(r'(^|/)img_bbox_head/transformer',
                             r'\1img_encoder', key)
            out[new_key] = v
        # else: dropped
    return _unflatten(out)


def _flatten(d, prefix=''):
    out = {}
    for k, v in d.items():
        key = f'{prefix}/{k}' if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat):
    out = {}
    for key, v in flat.items():
        parts = key.split('/')
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out
