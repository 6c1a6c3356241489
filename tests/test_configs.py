"""The ported config surface must load, merge, and build model objects."""
import os

import demf_tpu.models  # noqa: F401
from demf_tpu.utils.config import Config
from demf_tpu.utils.registry import DETECTORS, build_from_cfg

CFG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')


def test_votenet_baseline_config_builds():
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'baseline/votenet.py'))
    assert cfg.model.bbox_head.type == 'CAVoteHead'
    # merged from the base model file
    assert cfg.model.backbone.type == 'PointNet2SASSG'
    assert cfg.model.bbox_head.vote_module_cfg.in_channels == 256
    # override landed
    assert cfg.model.bbox_head.size_res_loss.beta == 0.15
    assert cfg.data.samples_per_gpu == 16
    model = build_from_cfg(cfg.model, DETECTORS)
    assert type(model).__name__ == 'VoteNet'


def test_demf_config_builds():
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'demf/demf_votenet.py'))
    assert cfg.model.type == 'DeMFVoteNet'
    # inherits the image branch from the deformdetr base
    assert cfg.model.img_backbone.depth == 50
    assert cfg.model.img_neck.type == 'ChannelMapper'
    assert cfg.model.img_encoder.encoder.num_layers == 6
    assert cfg.model.pts_bbox_head.decoder.num_layers == 1
    assert cfg.model.pts_bbox_head.pred_layer_cfg.conv_pred_layers == 2
    assert cfg.model.test_cfg.pts.ensemble_layers == [0, 1]
    assert cfg.optimizer.paramwise_cfg.custom_keys['decoder'].lr_mult == 0.05
    model = build_from_cfg(cfg.model, DETECTORS)
    assert model.freeze_img_branch
    assert model.frozen_param_patterns() == ['img_backbone', 'img_neck',
                                             'img_encoder']


def test_config_dump_reload_roundtrip(tmp_path):
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'demf/demf_votenet.py'))
    out = str(tmp_path / 'dumped.py')
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert dict(cfg2.model.pts_bbox_head.bbox_coder) == \
        dict(cfg.model.pts_bbox_head.bbox_coder)
    assert cfg2.lr == cfg.lr


def test_fcaf3d_config_builds():
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'fcaf3d/fcaf3d_sunrgbd.py'))
    assert cfg.model.type == 'FCAF3D'
    assert cfg.model.backbone.depth == 34
    assert cfg.model.head.n_reg_outs == 8
    assert cfg.model.head.pts_assign_threshold == 27
    model = build_from_cfg(cfg.model, DETECTORS)
    assert type(model).__name__ == 'FCAF3D'
    assert model.voxel_size == 0.01


def test_demf_fcaf3d_config_builds():
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'demf/demf_fcaf3d.py'))
    assert cfg.model.type == 'DeMFFcaf3D'
    assert cfg.model.head.type == 'DeMFFcaf3DHead'
    assert cfg.model.img_encoder.encoder.num_layers == 6
    assert cfg.model.head.num_queries == 256
    model = build_from_cfg(cfg.model, DETECTORS)
    assert model.freeze_img_branch
    assert model.frozen_param_patterns() == ['img_backbone', 'img_neck',
                                             'img_encoder']
