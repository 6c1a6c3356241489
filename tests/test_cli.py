"""CLI smoke: train.py (2 epochs, ckpt, eval hook) -> eval.py (mAP)."""
import os
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), '..')
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    import train as train_cli
    import eval as eval_cli

    cfg = os.path.join(REPO, 'configs/synthetic/votenet_tiny.py')
    work_dir = str(tmp_path / 'work')
    train_cli.main([cfg, '--work-dir', work_dir, '--seed', '1'])

    from demf_tpu.engine.checkpoint import latest_checkpoint
    ckpt = latest_checkpoint(work_dir)
    assert ckpt, 'no checkpoint written'
    # self-describing checkpoint: meta sidecar exists alongside
    assert os.path.isfile(ckpt + '.meta.json')

    out = str(tmp_path / 'results.pkl')
    eval_cli.main([cfg, ckpt, '--out', out, '--eval', 'mAP'])
    assert os.path.exists(out)
    # the dumped config must reload
    from demf_tpu.utils.config import Config
    dumped = Config.fromfile(os.path.join(work_dir, 'votenet_tiny.py'))
    assert dumped.model.type == 'VoteNet'
    # a training log exists with loss lines
    logs = [f for f in os.listdir(work_dir) if f.endswith('.log')]
    assert logs
    text = open(os.path.join(work_dir, logs[0])).read()
    assert 'loss' in text and 'eval @ epoch' in text


@pytest.mark.slow
def test_detr_pretrain_cli(tmp_path):
    """Stage-1 2D pretrain path through the train CLI (image-only batches)."""
    import train as train_cli
    cfg = os.path.join(REPO, 'configs/synthetic/detr_pretrain_tiny.py')
    work_dir = str(tmp_path / 'pretrain')
    train_cli.main([cfg, '--work-dir', work_dir, '--seed', '0',
                    '--no-validate'])
    ckpt_dir = os.path.join(work_dir, 'checkpoints')
    assert os.listdir(ckpt_dir)
    logs = [f for f in os.listdir(work_dir) if f.endswith('.log')]
    text = open(os.path.join(work_dir, logs[0])).read()
    assert 'loss_cls' in text and 'loss_iou' in text


@pytest.mark.slow
def test_demf_cached_train_cli(tmp_path):
    """Full DeMF fusion training through the CLI with the frozen
    image-feature cache active (precompute pass + cached train steps)."""
    import train as train_cli
    cfg = os.path.join(REPO, 'configs/synthetic/demf_tiny.py')
    work_dir = str(tmp_path / 'demf')
    train_cli.main([cfg, '--work-dir', work_dir, '--seed', '0',
                    '--no-validate'])
    assert os.listdir(os.path.join(work_dir, 'checkpoints'))
    assert os.listdir(os.path.join(work_dir, 'img_feat_cache'))
    logs = [f for f in os.listdir(work_dir) if f.endswith('.log')]
    text = open(os.path.join(work_dir, logs[0])).read()
    assert 'image-feature cache active' in text
    assert 'center_loss' in text


@pytest.mark.slow
def test_demf_fcaf3d_train_cli(tmp_path):
    """DeMF-FCAF3D sparse-voxel fusion training through the CLI with the
    frozen image-feature cache active."""
    import train as train_cli
    cfg = os.path.join(REPO, 'configs/synthetic/demf_fcaf3d_tiny.py')
    work_dir = str(tmp_path / 'demf_fcaf')
    train_cli.main([cfg, '--work-dir', work_dir, '--seed', '0',
                    '--no-validate'])
    assert os.listdir(os.path.join(work_dir, 'checkpoints'))
    logs = [f for f in os.listdir(work_dir) if f.endswith('.log')]
    text = open(os.path.join(work_dir, logs[0])).read()
    assert 'loss_bbox.f0' in text        # fusion-stage losses flowing
    assert 'loss_cls' in text
