"""Validate torch->flax weight conversion rules against torch numerics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from demf_tpu.engine.torch_port import TorchPorter  # noqa: E402
from demf_tpu.models.pointnet2 import SharedMLP  # noqa: E402
from demf_tpu.models.resnet import Bottleneck  # noqa: E402


def test_shared_mlp_port_matches_torch():
    """Dense+BN stack must reproduce torch Conv1d+BN1d outputs exactly."""
    tm = torch.nn.Sequential()
    c_in, chans = 5, [8, 6]
    prev = c_in
    layers = []
    for c in chans:
        conv = torch.nn.Conv1d(prev, c, 1, bias=False)
        bn = torch.nn.BatchNorm1d(c)
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.normal_()
        bn.bias.data.normal_()
        layers.append((conv, bn))
        prev = c
    sd = {}
    for i, (conv, bn) in enumerate(layers):
        sd[f'mlp.layer{i}.conv.weight'] = conv.weight.detach().numpy()
        sd[f'mlp.layer{i}.bn.weight'] = bn.weight.detach().numpy()
        sd[f'mlp.layer{i}.bn.bias'] = bn.bias.detach().numpy()
        sd[f'mlp.layer{i}.bn.running_mean'] = bn.running_mean.numpy()
        sd[f'mlp.layer{i}.bn.running_var'] = bn.running_var.numpy()

    x = np.random.RandomState(0).randn(2, 7, c_in).astype(np.float32)
    # torch forward (eval mode)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 2, 1))
        for conv, bn in layers:
            bn.eval()
            t = torch.relu(bn(conv(t)))
        ref = t.numpy().transpose(0, 2, 1)

    model = SharedMLP(chans)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    porter = TorchPorter(sd)
    porter.map_shared_mlp('', 'mlp', len(chans))
    # paths start with '/': strip the artifact of empty flax prefix
    porter.params = {k.lstrip('/'): v for k, v in porter.params.items()}
    porter.batch_stats = {k.lstrip('/'): v
                          for k, v in porter.batch_stats.items()}
    new_vars, report = porter.build(variables)
    assert not report['unmatched_flax_keys']
    out = model.apply(new_vars, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_resnet_bottleneck_port_matches_torch():
    """One bottleneck block (with downsample) vs a torch replica."""
    import torch.nn as tnn

    class TorchBottleneck(tnn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + self.downsample(x))

    tb = TorchBottleneck(8, 4, 2).eval()
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1, 0.1)
            m.bias.data.normal_(0, 0.1)

    sd = {f'blk.{k}': v.detach().numpy() for k, v in tb.state_dict().items()}
    x = np.random.RandomState(1).randn(1, 10, 12, 8).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ref = ref.transpose(0, 2, 3, 1)

    model = Bottleneck(planes=4, stride=2, downsample=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    porter = TorchPorter(sd)
    for c in (1, 2, 3):
        porter.map_conv2d(f'conv{c}', f'blk.conv{c}')
        porter.map_bn(f'bn{c}', f'blk.bn{c}')
    porter.map_conv2d('downsample_conv', 'blk.downsample.0')
    porter.map_bn('downsample_bn', 'blk.downsample.1')
    new_vars, report = porter.build(variables)
    assert not report['unmatched_flax_keys']
    out = model.apply(new_vars, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_dense_from_linear():
    lin = torch.nn.Linear(6, 3)
    sd = {'fc.weight': lin.weight.detach().numpy(),
          'fc.bias': lin.bias.detach().numpy()}
    x = np.random.randn(4, 6).astype(np.float32)
    with torch.no_grad():
        ref = lin(torch.from_numpy(x)).numpy()
    import flax.linen as nn
    model = nn.Dense(3)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    porter = TorchPorter(sd)
    porter.map_dense('', 'fc')
    porter.params = {k.lstrip('/'): v for k, v in porter.params.items()}
    new_vars, _ = porter.build(variables)
    out = model.apply(new_vars, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_fuse_conv_bn_preserves_outputs():
    """BN folding must leave eval-mode outputs unchanged."""
    import jax.numpy as jnp
    from demf_tpu.engine.fuse_bn import fuse_conv_bn
    from demf_tpu.models.pointnet2 import SharedMLP
    model = SharedMLP([8, 6])
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4).astype(
        np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # make BN stats non-trivial
    import jax as _jax
    variables = _jax.tree_util.tree_map(np.asarray, variables)
    for i in range(2):
        bn = variables['batch_stats'][f'BatchNorm_{i}']
        bn['mean'] = np.random.RandomState(i).randn(*bn['mean'].shape)
        bn['var'] = np.random.RandomState(i).rand(*bn['var'].shape) + 0.5
        bnp = variables['params'][f'BatchNorm_{i}']
        bnp['scale'] = np.random.RandomState(i + 5).randn(
            *bnp['scale'].shape)
    ref = model.apply(variables, x, train=False)
    fused, n = fuse_conv_bn(variables)
    assert n == 2
    out = model.apply(fused, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
