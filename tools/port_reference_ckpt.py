#!/usr/bin/env python
"""One-command released-checkpoint porting: torch ``.pth`` -> orbax.

Takes a reference-released mmdet3d checkpoint (reference README.md:43-46:
DeMF-VoteNet 65.5 mAP, ImVoteNet 64.4 mAP, the stage-1 2D-pretrain ckpt)
plus this framework's matching config, ports the state_dict through the
rule-driven layout maps (engine/torch_port.py) and writes an eval-ready
orbax checkpoint (the exact payload ``eval.py``'s ``load_params`` reads)
with a self-describing ``.meta.json`` sidecar.

Usage:
    python tools/port_reference_ckpt.py configs/demf/demf_votenet.py \
        demf_votenet.pth /path/out_ckpt
    python tools/port_reference_ckpt.py configs/baseline/imvotenet.py \
        imvotenet.pth /path/out_ckpt
    # stage-1 DETR-pretrain ckpt as a DeMF image-branch warm start
    # (reference demfnet.py:85-101 key remap):
    python tools/port_reference_ckpt.py configs/demf/demf_votenet.py \
        detr_stage1.pth /path/out_ckpt --stage1

Then:  python eval.py <config> /path/out_ckpt --eval mAP
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_template(cfg, seed=0):
    """Init the config's model on a small synthetic batch (param shapes do
    not depend on point count / image size) -> (model, variables)."""
    import jax
    import jax.numpy as jnp
    import demf_tpu.models  # noqa: F401  (registry population)
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from demf_tpu.zoo import synth_demf_batch, synth_fcaf3d_batch

    mtype = cfg.model['type']
    model = build_from_cfg(cfg.model, DETECTORS)
    if mtype in ('FCAF3D', 'DeMFFcaf3D'):
        batch = synth_fcaf3d_batch(1, 4096, 4)
    else:
        batch = synth_demf_batch(1, 4096, 4, hw=(128, 160))
        if mtype == 'ImVoteNet':
            batch['gt_bboxes'] = jnp.zeros((1, 4, 4), jnp.float32)
            batch['gt_labels'] = jnp.zeros((1, 4), jnp.int32)
            batch['gt_bboxes_valid'] = jnp.zeros((1, 4), bool)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(seed), batch)
    return model, dict(variables)


def port(cfg, state_dict, variables, stage1=False):
    """Route to the model family's porter.  Returns (variables, report)."""
    from demf_tpu.engine.torch_port import (port_demf_checkpoint,
                                            port_fcaf3d_checkpoint,
                                            port_imvotenet_checkpoint,
                                            port_stage1_into_demf)
    mtype = cfg.model['type']
    if stage1:
        if mtype != 'DeMFVoteNet':
            raise SystemExit('--stage1 warm start targets a DeMFVoteNet '
                             f'config, got {mtype}')
        return port_stage1_into_demf(state_dict, variables)
    if mtype == 'DeMFVoteNet':
        n_dec = cfg.model['pts_bbox_head']['decoder']['num_layers']
        return port_demf_checkpoint(state_dict, variables,
                                    num_decoder_layers=n_dec)
    if mtype == 'ImVoteNet':
        return port_imvotenet_checkpoint(state_dict, variables)
    if mtype in ('FCAF3D', 'DeMFFcaf3D'):
        depth = cfg.model['backbone'].get('depth', 34)
        return port_fcaf3d_checkpoint(state_dict, variables, depth=depth,
                                      strict=(mtype == 'FCAF3D'))
    raise SystemExit(f'no porter for model type {mtype}')


def save_eval_checkpoint(out_path, variables, meta=None):
    """Write the orbax payload ``eval.py`` / ``load_params`` consumes."""
    import jax
    import orbax.checkpoint as ocp
    out_path = os.path.abspath(out_path)
    state = {'params': variables['params']}
    if variables.get('batch_stats'):
        state['batch_stats'] = variables['batch_stats']
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_path, {'state': jax.device_get(state), 'epoch': 0},
               force=True)
    ckptr.wait_until_finished()
    if meta:
        import json
        with open(out_path + '.meta.json', 'w') as f:
            json.dump(meta, f, indent=1)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('config', help='this framework\'s matching config')
    ap.add_argument('torch_ckpt', help='released .pth checkpoint')
    ap.add_argument('out', help='output orbax checkpoint directory')
    ap.add_argument('--stage1', action='store_true',
                    help='torch ckpt is a stage-1 DETR 2D-pretrain ckpt; '
                         'warm-start the DeMF image branch '
                         '(demfnet.py:85-101 remap)')
    args = ap.parse_args(argv)

    from demf_tpu.utils.config import Config
    from demf_tpu.engine.torch_port import load_torch_state_dict
    cfg = Config.fromfile(args.config)
    print(f'building {cfg.model["type"]} template from {args.config}')
    model, variables = build_template(cfg)
    print(f'loading torch state_dict from {args.torch_ckpt}')
    sd = load_torch_state_dict(args.torch_ckpt)
    print(f'porting {len(sd)} torch tensors')
    new_vars, report = port(cfg, sd, variables, stage1=args.stage1)
    print(f'ported {report["ported"]} leaves '
          f'({len(report["unmatched_flax_keys"])} unmatched)')
    import demf_tpu
    meta = dict(
        config=cfg.dump(), config_file=os.path.basename(args.config),
        CLASSES=list(cfg.get('class_names', [])),
        demf_tpu_version=demf_tpu.__version__,
        ported_from=os.path.basename(args.torch_ckpt),
        stage1_warm_start=bool(args.stage1))
    out = save_eval_checkpoint(args.out, new_vars, meta)
    print(f'wrote {out}')
    return out


if __name__ == '__main__':
    main()
