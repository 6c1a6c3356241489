import os
import textwrap

from demf_tpu.utils.config import Config, DictAction


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_base_inheritance_and_merge(tmp_path):
    _write(tmp_path, 'base.py', """
        model = dict(type='VoteNet', backbone=dict(type='PointNet2SASSG',
                     in_channels=4), head=dict(type='VoteHead', n=256))
        lr = 0.008
    """)
    child = _write(tmp_path, 'child.py', """
        _base_ = ['./base.py']
        model = dict(head=dict(type='CAVoteHead'))
        lr = 0.016
    """)
    cfg = Config.fromfile(child)
    assert cfg.model.type == 'VoteNet'
    assert cfg.model.backbone.in_channels == 4
    assert cfg.model.head.type == 'CAVoteHead'
    assert cfg.model.head.n == 256  # merged, not replaced
    assert cfg.lr == 0.016


def test_delete_key(tmp_path):
    _write(tmp_path, 'base.py', "opt = dict(type='SGD', momentum=0.9)\n")
    child = _write(tmp_path, 'child.py', """
        _base_ = ['./base.py']
        opt = dict(_delete_=True, type='AdamW', lr=1e-3)
    """)
    cfg = Config.fromfile(child)
    assert cfg.opt.type == 'AdamW'
    assert 'momentum' not in cfg.opt


def test_merge_from_dict(tmp_path):
    f = _write(tmp_path, 'c.py', "model = dict(head=dict(num_classes=10))\n")
    cfg = Config.fromfile(f)
    cfg.merge_from_dict({'model.head.num_classes': 20, 'new_key': 1})
    assert cfg.model.head.num_classes == 20
    assert cfg.new_key == 1


def test_dump_roundtrip(tmp_path):
    f = _write(tmp_path, 'c.py', """
        model = dict(type='VoteNet', sizes=[[1, 2.5], [3, 4]])
        names = ('bed', 'chair')
    """)
    cfg = Config.fromfile(f)
    out = str(tmp_path / 'dump.py')
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert dict(cfg2.model) == dict(cfg.model)
    assert tuple(cfg2.names) == tuple(cfg.names)


def test_dictaction_parse():
    assert DictAction.parse_value('0.5') == 0.5
    assert DictAction.parse_value('true') is True
    assert DictAction.parse_value('[1,2]') == [1, 2]
    assert DictAction.parse_value('a,b') == ['a', 'b']
    assert DictAction.parse_value('hello') == 'hello'


def test_multi_base_cross_file(tmp_path):
    # the demf config inherits dataset + schedule + runtime + another model
    _write(tmp_path, 'a.py', "data = dict(samples_per_gpu=16)\n")
    _write(tmp_path, 'b.py', "lr = 0.008\noptimizer = dict(type='AdamW')\n")
    child = _write(tmp_path, 'c.py', """
        _base_ = ['./a.py', './b.py']
        optimizer = dict(lr=0.016)
    """)
    cfg = Config.fromfile(child)
    assert cfg.data.samples_per_gpu == 16
    assert cfg.optimizer.type == 'AdamW'
    assert cfg.optimizer.lr == 0.016
