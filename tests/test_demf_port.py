"""Full DeMF torch->flax checkpoint port: 100% key coverage test.

Synthesizes a state_dict with mmdet3d/mmcv-exact key names by building
REAL torch modules with the same nesting as the reference stack
(PointNet2SASSG SA/FP ConvModule MLPs, VoteModule, BaseConvBboxHead
``conv_pred{i}`` registration -- reference
class_agnostic_vote_head.py:396-403 -- mmcv BaseTransformerLayer
attentions/ffns/norms children, DeMF posembed Sequential indices, ResNet-50,
ChannelMapper, DeformableDetrEncoder), then asserts
``port_demf_checkpoint`` covers every flax template leaf with zero unused
torch keys (VERDICT.md round-1 item #2).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
nn = torch.nn

import jax  # noqa: E402

from demf_tpu.engine.torch_port import (flatten_params,  # noqa: E402
                                        port_demf_checkpoint)


# ---------------------------------------------------------------------
# torch mimics of the mmdet3d / mmcv module nesting (names must match the
# real stack exactly; channel sizes are derived from the flax template)
# ---------------------------------------------------------------------

class ConvModule1d(nn.Module):
    """mmcv ConvModule(Conv1d + BN1d): children named conv / bn."""

    def __init__(self, cin, cout, bias=False):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, 1, bias=bias)
        self.bn = nn.BatchNorm1d(cout)


class ConvModule2d(nn.Module):
    """mmcv ConvModule(Conv2d 1x1 + BN2d) as used by point SA MLPs."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn = nn.BatchNorm2d(cout)


class ConvModuleGN(nn.Module):
    """mmcv ConvModule(Conv2d + GN): children named conv / gn."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, padding, bias=False)
        self.gn = nn.GroupNorm(32, cout)


def _layered_sequential(mod_list):
    """nn.Sequential with children named layer0, layer1, ... (mmdet3d
    SharedMLP / BaseConvBboxHead shared_convs naming)."""
    seq = nn.Sequential()
    for i, m in enumerate(mod_list):
        seq.add_module(f'layer{i}', m)
    return seq


class PointSAMimic(nn.Module):
    def __init__(self, chans):
        super().__init__()
        self.mlps = nn.ModuleList([_layered_sequential(
            [ConvModule2d(cin, cout) for cin, cout in chans])])


class PointFPMimic(nn.Module):
    def __init__(self, chans):
        super().__init__()
        self.mlps = _layered_sequential(
            [ConvModule2d(cin, cout) for cin, cout in chans])


class VoteModuleMimic(nn.Module):
    def __init__(self, chans, out_ch):
        super().__init__()
        self.vote_conv = nn.Sequential(
            *[ConvModule1d(cin, cout) for cin, cout in chans])
        self.conv_out = nn.Conv1d(chans[-1][1], out_ch, 1)


class BaseConvBboxHeadMimic(nn.Module):
    def __init__(self, chans, ncls, nreg):
        super().__init__()
        # the reference pred_layer_cfg sets bias=True
        # (configs/demf/demf_votenet.py:66)
        self.shared_convs = _layered_sequential(
            [ConvModule1d(cin, cout, bias=True) for cin, cout in chans])
        self.conv_cls = nn.Conv1d(chans[-1][1], ncls, 1)
        self.conv_reg = nn.Conv1d(chans[-1][1], nreg, 1)


class MSDAMimic(nn.Module):
    """mmcv MultiScaleDeformableAttention parameter surface."""

    def __init__(self, dims, n_off, n_attn):
        super().__init__()
        self.sampling_offsets = nn.Linear(dims, n_off)
        self.attention_weights = nn.Linear(dims, n_attn)
        self.value_proj = nn.Linear(dims, dims)
        self.output_proj = nn.Linear(dims, dims)


class FFNMimic(nn.Module):
    """mmcv FFN: layers = Sequential(Sequential(Linear, ReLU, Drop), Linear,
    Drop) -> keys layers.0.0.* and layers.1.*"""

    def __init__(self, dims, feed):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dims, feed), nn.ReLU(),
                          nn.Dropout(0.0)),
            nn.Linear(feed, dims), nn.Dropout(0.0))


class MhaMimic(nn.Module):
    """mmcv MultiheadAttention wraps nn.MultiheadAttention as .attn"""

    def __init__(self, dims, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(dims, heads)


class EncoderLayerMimic(nn.Module):
    def __init__(self, dims, feed, n_off, n_attn):
        super().__init__()
        self.attentions = nn.ModuleList([MSDAMimic(dims, n_off, n_attn)])
        self.ffns = nn.ModuleList([FFNMimic(dims, feed)])
        self.norms = nn.ModuleList([nn.LayerNorm(dims) for _ in range(2)])


class DecoderLayerMimic(nn.Module):
    def __init__(self, dims, feed, heads, n_off, n_attn):
        super().__init__()
        self.attentions = nn.ModuleList(
            [MhaMimic(dims, heads), MSDAMimic(dims, n_off, n_attn)])
        self.ffns = nn.ModuleList([FFNMimic(dims, feed)])
        self.norms = nn.ModuleList([nn.LayerNorm(dims) for _ in range(3)])


class PosembedMimic(nn.Module):
    """DeMF PositionEmbeddingLearned (reference transformer.py:18-36)."""

    def __init__(self, cin, dims):
        super().__init__()
        self.position_embedding_head = nn.Sequential(
            nn.Conv1d(cin, dims, 1), nn.BatchNorm1d(dims),
            nn.ReLU(inplace=True), nn.Conv1d(dims, dims, 1))


class DemfDecoderMimic(nn.Module):
    """DeMFTransformerDecoderLayer: .layer + .posembed children."""

    def __init__(self, dims, feed, heads, n_off, n_attn, pos_in):
        super().__init__()
        self.layer = DecoderLayerMimic(dims, feed, heads, n_off, n_attn)
        self.posembed = PosembedMimic(pos_in, dims)


class EncoderSeqMimic(nn.Module):
    def __init__(self, dims, feed, n_layers, n_off, n_attn):
        super().__init__()
        self.layers = nn.ModuleList(
            [EncoderLayerMimic(dims, feed, n_off, n_attn)
             for _ in range(n_layers)])


class DeformDetrEncoderMimic(nn.Module):
    def __init__(self, dims, feed, n_layers, n_off, n_attn, n_levels):
        super().__init__()
        self.encoder = EncoderSeqMimic(dims, feed, n_layers, n_off, n_attn)
        self.level_embeds = nn.Parameter(torch.zeros(n_levels, dims))


class BottleneckMimic(nn.Module):
    def __init__(self, cin, mid, cout, stride, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))


class ResNet50Mimic(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for s, (n, mid) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            blocks = []
            cout = mid * 4
            for i in range(n):
                blocks.append(BottleneckMimic(
                    cin if i == 0 else cout, mid, cout,
                    stride=(1 if (s == 0 or i > 0) else 2),
                    downsample=(i == 0)))
            setattr(self, f'layer{s + 1}', nn.Sequential(*blocks))
            cin = cout


class ChannelMapperMimic(nn.Module):
    def __init__(self, ins, dims):
        super().__init__()
        self.convs = nn.ModuleList(
            [ConvModuleGN(c, dims, 1) for c in ins])
        # mmdet ChannelMapper extra level: 3x3 stride-2 pad-1 conv (the
        # kernel SHAPE is stride-agnostic, so only the forward-parity test
        # can catch this; key-coverage alone cannot)
        self.extra_convs = nn.ModuleList(
            [ConvModuleGN(ins[-1], dims, 3, stride=2, padding=1)])


class PointNet2Mimic(nn.Module):
    def __init__(self, sa_chans, fp_chans):
        super().__init__()
        self.SA_modules = nn.ModuleList(
            [PointSAMimic(c) for c in sa_chans])
        self.FP_modules = nn.ModuleList(
            [PointFPMimic(c) for c in fp_chans])


class DeMFVoteHeadMimic(nn.Module):
    def __init__(self, tmpl):
        super().__init__()

        def shapes(path, n, fmt='Dense_{i}'):
            out = []
            for i in range(n):
                k = tmpl[f'{path}/{fmt.format(i=i)}/kernel']
                out.append(tuple(k.shape))
            return out

        self.vote_module = VoteModuleMimic(
            shapes('pts_bbox_head/vote_module/vote_conv', 2),
            tmpl['pts_bbox_head/vote_module/conv_out/kernel'].shape[1])
        # vote_aggregation: same ConvModule2d MLP structure as SA modules
        chans = [tuple(
            tmpl[f'pts_bbox_head/vote_aggregation/mlps/Dense_{i}/kernel']
            .shape) for i in range(3)]
        self.vote_aggregation = PointSAMimic(chans)
        dims = 256
        n_off = tmpl[
            'pts_bbox_head/decoder_0/layer/cross_attn/sampling_offsets/'
            'kernel'].shape[1]
        n_attn = tmpl[
            'pts_bbox_head/decoder_0/layer/cross_attn/attention_weights/'
            'kernel'].shape[1]
        self.decoder = nn.ModuleList([DemfDecoderMimic(
            dims, 1024, 8, n_off, n_attn,
            tmpl['pts_bbox_head/decoder_0/posembed/fc1/kernel'].shape[0])])
        for i in range(2):
            ncls = tmpl[f'pts_bbox_head/conv_pred{i}/conv_cls/kernel'].shape[1]
            nreg = tmpl[f'pts_bbox_head/conv_pred{i}/conv_reg/kernel'].shape[1]
            shared = [tuple(
                tmpl[f'pts_bbox_head/conv_pred{i}/shared_convs/Dense_{j}/'
                     f'kernel'].shape) for j in range(2)]
            self.add_module(f'conv_pred{i}',
                            BaseConvBboxHeadMimic(shared, ncls, nreg))


class DeMFVoteNetMimic(nn.Module):
    """Full DeMFVoteNet parameter surface with mmdet3d-exact names."""

    def __init__(self, tmpl):
        super().__init__()
        sa_chans = []
        for i in range(4):
            sa_chans.append([tuple(
                tmpl[f'pts_backbone/SA_modules_{i}/mlps/Dense_{j}/kernel']
                .shape) for j in range(3)])
        fp_chans = []
        for i in range(2):
            fp_chans.append([tuple(
                tmpl[f'pts_backbone/FP_modules_{i}/mlps/Dense_{j}/kernel']
                .shape) for j in range(2)])
        self.pts_backbone = PointNet2Mimic(sa_chans, fp_chans)
        self.pts_bbox_head = DeMFVoteHeadMimic(tmpl)
        self.img_backbone = ResNet50Mimic()
        self.img_neck = ChannelMapperMimic((512, 1024, 2048), 256)
        self.img_encoder = DeformDetrEncoderMimic(256, 1024, 6, 256, 128, 4)


@pytest.fixture(scope='module')
def demf_template():
    import demf_tpu.models  # noqa: F401
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from demf_tpu.zoo import load_model_cfg, synth_demf_batch

    cfg = load_model_cfg('demf/demf_votenet.py')
    model = build_from_cfg(cfg.model, DETECTORS)
    batch = synth_demf_batch(b=1, p=2048, hw=(128, 160), valid_hw=(120, 156))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, batch, variables


@pytest.mark.slow
def test_port_demf_checkpoint_full_coverage(demf_template):
    """Every flax leaf ported, every torch key consumed, shapes exact."""
    _, _, variables = demf_template
    tmpl = flatten_params(variables['params'])
    torch.manual_seed(0)
    tm = DeMFVoteNetMimic(tmpl)
    # randomize BN running stats so a porting mixup cannot hide
    for m in tm.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.normal_()
            m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    new_vars, report = port_demf_checkpoint(sd, dict(variables),
                                            strict=True)
    # strict mode already asserts coverage; spot-check numerics round-trip
    flat = flatten_params(new_vars['params'])
    w = sd['pts_bbox_head.conv_pred1.conv_reg.weight']
    np.testing.assert_allclose(
        flat['pts_bbox_head/conv_pred1/conv_reg/kernel'],
        w[:, :, 0].transpose(1, 0))
    stats = flatten_params(new_vars['batch_stats'])
    np.testing.assert_allclose(
        stats['pts_backbone/SA_modules_2/mlps/BatchNorm_1/mean'],
        sd['pts_backbone.SA_modules.2.mlps.0.layer1.bn.running_mean'])
    # MHA in_proj split: query kernel block equals torch rows 0:E
    e = 256
    inw = sd['pts_bbox_head.decoder.0.layer.attentions.0.attn.'
             'in_proj_weight']
    np.testing.assert_allclose(
        flat['pts_bbox_head/decoder_0/layer/self_attn/attn/query/kernel']
        .reshape(e, e), inw[:e].transpose(1, 0))


@pytest.fixture(scope='module')
def fcaf3d_template():
    import demf_tpu.models  # noqa: F401
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from test_fcaf3d import tiny_cfg, synth_batch
    model = build_from_cfg(tiny_cfg(), DETECTORS)
    batch = synth_batch(np.random.RandomState(0), b=1, p=1500, g=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, variables


def _synth_fcaf3d_torch_sd(variables, rng):
    """mmdet3d-exact key names for MinkResNet18(stem16) + FCAF3DHead,
    shapes taken from the flax template (ME kernel layout == ours up to
    tap order; MinkowskiBatchNorm nests BatchNorm1d under `.bn`)."""
    from demf_tpu.engine.torch_port import flatten_params
    pt = flatten_params(variables['params'])
    st = flatten_params(variables['batch_stats'])
    sd = {}

    def bn(tkey, fkey):
        sd[f'{tkey}.bn.weight'] = rng.rand(
            *pt[f'{fkey}/scale'].shape).astype(np.float32)
        sd[f'{tkey}.bn.bias'] = rng.rand(
            *pt[f'{fkey}/bias'].shape).astype(np.float32)
        sd[f'{tkey}.bn.running_mean'] = rng.randn(
            *st[f'{fkey}/mean'].shape).astype(np.float32)
        sd[f'{tkey}.bn.running_var'] = rng.rand(
            *st[f'{fkey}/var'].shape).astype(np.float32) + 0.5
        sd[f'{tkey}.bn.num_batches_tracked'] = np.asarray(7)

    def conv(tkey, fkey, dense=False):
        shape = pt[f'{fkey}/kernel'].shape if dense else pt[fkey].shape
        if not dense and shape[0] == 1:      # our (1, C, Co) k=1 tap form
            shape = shape[1:]
        sd[tkey] = rng.randn(*shape).astype(np.float32)

    conv('backbone.conv1.kernel', 'backbone/stem_conv')
    bn('backbone.norm1', 'backbone/stem_bn')
    for s, n in enumerate((2, 2, 2, 2)):          # depth 18
        for i in range(n):
            tp, fp = f'backbone.layer{s + 1}.{i}', \
                f'backbone/layer{s + 1}_{i}'
            conv(f'{tp}.conv1.kernel', f'{fp}/conv1')
            bn(f'{tp}.norm1', f'{fp}/bn1')
            conv(f'{tp}.conv2.kernel', f'{fp}/conv2')
            bn(f'{tp}.norm2', f'{fp}/bn2')
            if i == 0:
                conv(f'{tp}.downsample.0.kernel', f'{fp}/down')
                bn(f'{tp}.downsample.1', f'{fp}/bn_down')
    for i in range(1, 4):
        tp, fp = f'head.up_block_{i}', f'head/up_block_{i}'
        conv(f'{tp}.0.kernel', f'{fp}_tconv')
        bn(f'{tp}.1', f'{fp}_tbn')
        conv(f'{tp}.3.kernel', f'{fp}_conv')
        bn(f'{tp}.4', f'{fp}_bn')
    for i in range(4):
        conv(f'head.out_block_{i}.0.kernel', f'head/out_block_{i}_conv')
        bn(f'head.out_block_{i}.1', f'head/out_block_{i}_bn')
    conv('head.centerness_conv.kernel', 'head/conv_center', dense=True)
    conv('head.reg_conv.kernel', 'head/conv_reg', dense=True)
    conv('head.cls_conv.kernel', 'head/conv_cls', dense=True)
    sd['head.cls_conv.bias'] = rng.randn(
        *pt['head/conv_cls/bias'].shape).astype(np.float32)
    return sd


@pytest.mark.slow
def test_port_fcaf3d_checkpoint_full_coverage(fcaf3d_template):
    """MinkResNet+FCAF3DHead map: every flax leaf ported, every torch
    key consumed, tap permutation applied."""
    from demf_tpu.engine.torch_port import port_fcaf3d_checkpoint
    _, variables = fcaf3d_template
    rng = np.random.RandomState(1)
    sd = _synth_fcaf3d_torch_sd(variables, rng)
    new_vars, report = port_fcaf3d_checkpoint(sd, dict(variables),
                                              depth=18, strict=True)
    flat = flatten_params(new_vars['params'])
    # tap permutation: ME axis-0-fastest tap t_me lands at our
    # (i0*k+i1)*k+i2
    w = sd['backbone.conv1.kernel']              # (27, 3, 16)
    assert np.allclose(flat['backbone/stem_conv'][(1 * 3 + 0) * 3 + 0],
                       w[1])                     # t_me=1 -> (i0=1,0,0)
    stats = flatten_params(new_vars['batch_stats'])
    np.testing.assert_allclose(
        stats['head/out_block_2_bn/mean'],
        sd['head.out_block_2.1.bn.running_mean'])
