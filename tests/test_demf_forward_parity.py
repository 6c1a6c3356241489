"""Whole-model DeMF forward parity: ported torch weights -> flax forward.

VERDICT round-2 item #3: the strongest in-sandbox proxy for "released
checkpoint -> 65.5/46.1".  We rebuild the reference's full DeMF graph in
plain torch (module structure per /root/reference/demf/modeling/*, no mmcv
needed), synthesize one random state_dict, load it into BOTH sides
(``port_demf_checkpoint`` for the flax model), run the full forward —
image branch (ResNet-50 -> ChannelMapper -> 6-layer deformable encoder),
point branch (PointNet2SASSG), vote -> aggregate -> conv_pred0 -> decoder
layer (MHA self-attn + learned posembed + MSDA cross-attn at projected
reference points) -> conv_pred1 — and compare every prediction tensor.
A port mixup (transpose, BN stat swap, MHA in_proj split, tap order,
missing key) shifts outputs far beyond the tolerance.

Sampling-index ops (FPS / ball query) are shared from the flax ops on both
sides: their selection semantics have their own numpy oracles
(tests/test_ops.py) and index selection is where fp32 reduction-order
noise would otherwise flip discrete choices and blow up a numerics diff
that has nothing to do with the checkpoint port.  Everything NUMERIC
(convs, norms, attention, bilinear sampling, projections) is computed
independently per side.  MSDA runs fp32 on both sides
(DEMF_TPU_MSDA_F32=1 — the bf16 gather planes are a perf default, not
model math).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')
tnn = torch.nn
F = torch.nn.functional

os.environ['DEMF_TPU_MSDA_F32'] = '1'

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from demf_tpu.ops.grouping import ball_query  # noqa: E402
from demf_tpu.ops.sampling import furthest_point_sample  # noqa: E402
from test_demf_port import DeMFVoteNetMimic  # noqa: E402


# ---------------------------------------------------------------------
# torch reference forward (mirrors /root/reference/demf/modeling/*)
# ---------------------------------------------------------------------

def _bn_eval(bn, x):
    return F.batch_norm(x, bn.running_mean, bn.running_var, bn.weight,
                        bn.bias, training=False, eps=bn.eps)


def _conv_module(cm, x):
    """mmcv ConvModule (conv + bn/gn + relu) in eval mode."""
    x = cm.conv(x)
    if hasattr(cm, 'bn'):
        x = _bn_eval(cm.bn, x)
    elif hasattr(cm, 'gn'):
        x = cm.gn(x)
    return F.relu(x)


def _shared_idx(fn, *args):
    """Run a flax index op and hand the indices to the torch side."""
    return torch.from_numpy(np.asarray(fn(*args)).astype(np.int64))


def t_gather(points, idx):
    """(B, N, C), (B, M) -> (B, M, C)."""
    return torch.gather(points, 1,
                        idx[..., None].expand(-1, -1, points.shape[-1]))


def t_group(points, idx):
    """(B, N, C), (B, M, S) -> (B, M, S, C)."""
    b, m, s = idx.shape
    flat = t_gather(points, idx.reshape(b, m * s))
    return flat.reshape(b, m, s, points.shape[-1])


def t_sa_forward(sa, xyz, feats, num_point, radius, nsample,
                 indices=None, target_xyz=None, use_xyz=True,
                 normalize_xyz=True):
    """mmdet3d PointSAModule forward (single-scale grouping)."""
    if indices is not None:
        new_xyz = t_gather(xyz, indices)
    elif target_xyz is not None:
        new_xyz = target_xyz
    else:
        indices = _shared_idx(furthest_point_sample,
                              jnp.asarray(xyz.numpy()), num_point)
        new_xyz = t_gather(xyz, indices)
    idx = _shared_idx(ball_query, radius, nsample,
                      jnp.asarray(xyz.numpy()), jnp.asarray(new_xyz.numpy()))
    grouped_xyz = t_group(xyz, idx) - new_xyz[:, :, None]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    grouped = grouped_xyz
    if feats is not None:
        gf = t_group(feats, idx)
        grouped = torch.cat([grouped_xyz, gf], -1) if use_xyz else gf
    # (B, M, S, C) -> (B, C, M, S) for the Conv2d 1x1 MLP
    x = grouped.permute(0, 3, 1, 2)
    for layer in sa.mlps[0]:
        x = _conv_module(layer, x)
    pooled = x.max(dim=3).values            # (B, C, M)
    return new_xyz, pooled.permute(0, 2, 1), indices


def t_fp_forward(fp, tgt_xyz, src_xyz, tgt_feats, src_feats):
    """mmdet3d PointFPModule: 3-NN inverse-distance interp + MLP."""
    # same a2+b2-2ab formula as ops/grouping._sqdist so the top-3
    # neighbor choice cannot flip on reduction-order noise
    a2 = (tgt_xyz * tgt_xyz).sum(-1)[..., :, None]
    b2 = (src_xyz * src_xyz).sum(-1)[..., None, :]
    d2 = (a2 + b2 - 2 * torch.einsum('bmc,bnc->bmn', tgt_xyz,
                                     src_xyz)).clamp(min=0.0)
    dist2, idx = torch.topk(-d2, 3, dim=-1)
    dist2 = torch.clamp(-dist2, min=0.0)
    recip = 1.0 / (dist2 + 1e-8)
    w = recip / recip.sum(-1, keepdim=True)
    gathered = t_group(src_feats, idx)               # (B, N, 3, C)
    interp = (gathered * w[..., None]).sum(2)
    new = torch.cat([interp, tgt_feats], -1) if tgt_feats is not None \
        else interp
    x = new.permute(0, 2, 1)[..., None]              # (B, C, N, 1)
    for layer in fp.mlps:
        x = _conv_module(layer, x)
    return x[..., 0].permute(0, 2, 1)


def t_pointnet2(pn, points, cfg):
    xyz = points[..., :3]
    feats = points[..., 3:] if points.shape[-1] > 3 else None
    num_points = cfg['num_points']
    radii = cfg['radius']
    nsamples = cfg['num_samples']
    sa_xyz, sa_feats = [xyz], [feats]
    for i, sa in enumerate(pn.SA_modules):
        nx, nf, _ = t_sa_forward(sa, sa_xyz[-1], sa_feats[-1],
                                 num_points[i], radii[i], nsamples[i])
        sa_xyz.append(nx)
        sa_feats.append(nf)
    fp_xyz, fp_feats = [sa_xyz[-1]], [sa_feats[-1]]
    n_sa = len(pn.SA_modules)
    for i, fp in enumerate(pn.FP_modules):
        tgt = n_sa - i - 1
        nf = t_fp_forward(fp, sa_xyz[tgt], fp_xyz[-1], sa_feats[tgt],
                          fp_feats[-1])
        fp_xyz.append(sa_xyz[tgt])
        fp_feats.append(nf)
    return fp_xyz[-1], fp_feats[-1]


def t_vote_module(vm, seed_xyz, seed_feats):
    """mmdet3d VoteModule, vote_per_seed=1, with_res_feat, norm_feats."""
    x = seed_feats.permute(0, 2, 1)                  # (B, C, N)
    for layer in vm.vote_conv:
        x = _conv_module(layer, x)
    out = vm.conv_out(x).permute(0, 2, 1)            # (B, N, 3+C)
    offset = out[..., :3]
    vote_xyz = seed_xyz + offset
    vote_feats = seed_feats + out[..., 3:]
    norm = vote_feats.norm(p=2, dim=-1, keepdim=True).clamp(min=1e-12)
    return vote_xyz, vote_feats / norm


def t_conv_bbox_head(head, feats):
    """BaseConvBboxHead: shared Conv1d trunk -> cls/reg 1x1 heads."""
    x = feats.permute(0, 2, 1)
    for layer in head.shared_convs:
        x = _conv_module(layer, x)
    return head.conv_cls(x), head.conv_reg(x)        # (B, C, N)


def t_resnet50(rn, img):
    """mmdet ResNet-50, pytorch style, eval BN, out_indices (1, 2, 3)."""
    x = F.relu(_bn_eval(rn.bn1, rn.conv1(img)))
    x = F.max_pool2d(x, 3, 2, 1)
    outs = []
    for s in range(4):
        layer = getattr(rn, f'layer{s + 1}')
        for blk in layer:
            identity = x
            out = F.relu(_bn_eval(blk.bn1, blk.conv1(x)))
            out = F.relu(_bn_eval(blk.bn2, blk.conv2(out)))
            out = _bn_eval(blk.bn3, blk.conv3(out))
            if hasattr(blk, 'downsample'):
                identity = _bn_eval(blk.downsample[1],
                                    blk.downsample[0](x))
            x = F.relu(out + identity)
        if s in (1, 2, 3):
            outs.append(x)
    return outs


def t_channel_mapper(cm, feats):
    outs = [conv.gn(conv.conv(f)) for conv, f in zip(cm.convs, feats)]
    outs.append(cm.extra_convs[0].gn(cm.extra_convs[0].conv(feats[-1])))
    return outs


def t_level_masks(img_shape, batch_hw, spatial_shapes):
    big_h, big_w = batch_hw
    masks = []
    for (h, w) in spatial_shapes:
        rows = (torch.arange(h) * big_h // h)
        cols = (torch.arange(w) * big_w // w)
        row_pad = rows[None, :] >= img_shape[:, :1]
        col_pad = cols[None, :] >= img_shape[:, 1:2]
        masks.append(row_pad[:, :, None] | col_pad[:, None, :])
    return masks


def t_valid_ratios(masks):
    out = []
    for m in masks:
        vh = (~m[:, :, 0]).sum(1).float() / m.shape[1]
        vw = (~m[:, 0, :]).sum(1).float() / m.shape[2]
        out.append(torch.stack([vw, vh], -1))
    return torch.stack(out, 1)


def t_sine_pos(mask, num_feats=128, temperature=10000,
               scale=2 * np.pi, offset=-0.5, eps=1e-6):
    not_mask = (~mask).float()
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    y = (y + offset) / (y[:, -1:, :] + eps) * scale
    x = (x + offset) / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats).float()
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode='floor')
                            / num_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack([px[..., 0::2].sin(), px[..., 1::2].cos()],
                     -1).flatten(3)
    py = torch.stack([py[..., 0::2].sin(), py[..., 1::2].cos()],
                     -1).flatten(3)
    return torch.cat([py, px], -1)


def t_bilinear_sample(rows, loc_xy, h, w):
    """Zero-padded align_corners=False bilinear read.

    rows: (B, heads, H*W, hd); loc_xy: (B, heads, S, 2) in [0, 1].
    """
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = torch.floor(x)
    y0 = torch.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    out = 0.0
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            xi = x0.long() + dx
            yi = y0.long() + dy
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1))
            g = torch.gather(rows, 2, idx[..., None].expand(
                -1, -1, -1, rows.shape[-1]))
            out = out + g * (wx * wy * ok.float())[..., None]
    return out


def t_msda_layer(att, query, value, query_pos, key_padding_mask,
                 reference_points, spatial_shapes):
    """mmcv MultiScaleDeformableAttention (batch-first wrapped)."""
    b, nq, c = query.shape
    heads, hd = 8, c // 8
    nlv = len(spatial_shapes)
    identity = query
    q = query + query_pos if query_pos is not None else query
    v = att.value_proj(value)
    if key_padding_mask is not None:
        v = v.masked_fill(key_padding_mask[..., None], 0.0)
    v = v.reshape(b, -1, heads, hd)
    npts = att.sampling_offsets.out_features // (heads * nlv * 2)
    offsets = att.sampling_offsets(q).reshape(b, nq, heads, nlv, npts, 2)
    attn = att.attention_weights(q).reshape(b, nq, heads, nlv * npts)
    attn = attn.softmax(-1).reshape(b, nq, heads, nlv, npts)
    normalizer = torch.tensor([[w_, h_] for (h_, w_) in spatial_shapes],
                              dtype=torch.float32)
    locs = reference_points[:, :, None, :, None, :] + \
        offsets / normalizer[None, None, None, :, None, :]
    out = torch.zeros(b, heads, nq, hd)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        rows = v[:, start:start + h * w].permute(0, 2, 1, 3)
        loc = locs[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
            b, heads, nq * npts, 2)
        sampled = t_bilinear_sample(rows, loc, h, w).reshape(
            b, heads, nq, npts, hd)
        a = attn[:, :, :, lvl].permute(0, 2, 1, 3)
        out = out + (sampled * a[..., None]).sum(3)
        start += h * w
    out = out.permute(0, 2, 1, 3).reshape(b, nq, c)
    return identity + att.output_proj(out)


def t_encoder(enc, mlvl_feats, img_shape):
    """reference DeformableDetrEncoder forward (NCHW in, NCHW out)."""
    spatial_shapes = tuple((f.shape[2], f.shape[3]) for f in mlvl_feats)
    batch_hw = (mlvl_feats[0].shape[2] * 8, mlvl_feats[0].shape[3] * 8)
    masks = t_level_masks(img_shape, batch_hw, spatial_shapes)
    valid_ratios = t_valid_ratios(masks)
    b = mlvl_feats[0].shape[0]

    feat_flat, pos_flat, mask_flat = [], [], []
    for lvl, (f, m) in enumerate(zip(mlvl_feats, masks)):
        pos = t_sine_pos(m) + enc.level_embeds[lvl]
        feat_flat.append(f.flatten(2).permute(0, 2, 1))
        pos_flat.append(pos.flatten(1, 2))
        mask_flat.append(m.flatten(1))
    x = torch.cat(feat_flat, 1)
    pos = torch.cat(pos_flat, 1)
    key_padding_mask = torch.cat(mask_flat, 1)

    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (torch.arange(h).float() + 0.5)[None, :] / \
            (valid_ratios[:, lvl, 1:2] * h)
        rx = (torch.arange(w).float() + 0.5)[None, :] / \
            (valid_ratios[:, lvl, 0:1] * w)
        gy = ry[:, :, None].expand(b, h, w)
        gx = rx[:, None, :].expand(b, h, w)
        refs.append(torch.stack([gx, gy], -1).reshape(b, h * w, 2))
    refs = torch.cat(refs, 1)
    reference_points = refs[:, :, None, :] * valid_ratios[:, None]

    for layer in enc.encoder.layers:
        x = t_msda_layer(layer.attentions[0], x, x, pos, key_padding_mask,
                         reference_points, spatial_shapes)
        x = layer.norms[0](x)
        ffn = layer.ffns[0]
        x = x + ffn.layers[1](F.relu(ffn.layers[0][0](x)))
        x = layer.norms[1](x)

    outs, start = [], 0
    for (h, w) in spatial_shapes:
        outs.append(x[:, start:start + h * w].reshape(
            b, h, w, -1).permute(0, 3, 1, 2))
        start += h * w
    return outs, key_padding_mask, valid_ratios, spatial_shapes


def t_project_points(points, depth2img, img_shape):
    """identity-aug reference-point bridge (ref :524-547)."""
    hom = torch.cat([points, torch.ones_like(points[..., :1])], -1)
    p2d = torch.einsum('bnj,bkj->bnk', hom, depth2img)
    uv = p2d[..., :2] / p2d[..., 2:3].clamp(min=1e-6)
    shape = img_shape.float()
    u = uv[..., 0] / (shape[:, 1:2] - 1)
    v = uv[..., 1] / (shape[:, 0:1] - 1)
    return torch.stack([u, v], -1).clamp(0.0, 1.0)


def t_split_pred_demf(cls_pred, reg_pred, base_xyz, num_dir_bins=12):
    cls_t = cls_pred.permute(0, 2, 1)
    reg_t = reg_pred.permute(0, 2, 1)
    nb = num_dir_bins
    return dict(center=base_xyz + reg_t[..., 0:3], size=reg_t[..., 3:6],
                dir_class=reg_t[..., 6:6 + nb],
                dir_res_norm=reg_t[..., 6 + nb:6 + 2 * nb],
                obj_scores=cls_t[..., 0:2], sem_scores=cls_t[..., 2:])


def t_demf_forward(tm, points, img, img_shape, depth2img, backbone_cfg):
    """Full reference DeMFVoteNet forward (demfnet.py:134-283), eval mode,
    sample_mod='seed', identity 3D/2D augmentation records."""
    img_feats, key_padding_mask, valid_ratios, spatial_shapes = t_encoder(
        tm.img_encoder, t_channel_mapper(tm.img_neck, t_resnet50(
            tm.img_backbone, img)), img_shape)

    seed_xyz, seed_feats = t_pointnet2(tm.pts_backbone, points,
                                       backbone_cfg)
    head = tm.pts_bbox_head
    vote_xyz, vote_feats = t_vote_module(head.vote_module, seed_xyz,
                                         seed_feats)
    # sample_mod='seed': FPS on seeds, aggregate at the voted positions
    fps_idx = _shared_idx(furthest_point_sample,
                          jnp.asarray(seed_xyz.numpy()), 256)
    agg_xyz, agg_feats, _ = t_sa_forward(
        head.vote_aggregation, vote_xyz, vote_feats, 256, 0.3, 16,
        indices=fps_idx)

    cls0, reg0 = t_conv_bbox_head(head.conv_pred0, agg_feats)
    dec0 = t_split_pred_demf(cls0, reg0, agg_xyz)

    feat_flatten = torch.cat(
        [f.flatten(2).permute(0, 2, 1) for f in img_feats], 1)
    reference_points = t_project_points(agg_xyz, depth2img, img_shape)
    ref_inp = reference_points[:, :, None, :] * valid_ratios[:, None]

    dl = head.decoder[0]
    query_pos_input = torch.cat([dec0['center'], dec0['size']],
                                -1).detach()
    pe = dl.posembed.position_embedding_head
    qp = pe[3](F.relu(_bn_eval(pe[1], pe[0](
        query_pos_input.permute(0, 2, 1))))).permute(0, 2, 1)

    layer = dl.layer
    q = agg_feats
    qq = (q + qp).permute(1, 0, 2)                    # (N, B, C) seq-first
    attn_out, _ = layer.attentions[0].attn(qq, qq, q.permute(1, 0, 2))
    q = layer.norms[0](q + attn_out.permute(1, 0, 2))
    q = t_msda_layer(layer.attentions[1], q, feat_flatten, qp,
                     key_padding_mask, ref_inp, spatial_shapes)
    q = layer.norms[1](q)
    ffn = layer.ffns[0]
    q = layer.norms[2](q + ffn.layers[1](F.relu(ffn.layers[0][0](q))))

    cls1, reg1 = t_conv_bbox_head(head.conv_pred1, q)
    dec1 = t_split_pred_demf(cls1, reg1, agg_xyz)
    return dict(agg_xyz=agg_xyz, seed_feats=seed_feats,
                img_feat0=img_feats[0], dec0=dec0, dec1=dec1)


# ---------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------

@pytest.mark.slow
def test_whole_model_forward_parity():
    import demf_tpu.models  # noqa: F401
    from demf_tpu.engine.torch_port import (flatten_params,
                                            port_demf_checkpoint)
    from demf_tpu.utils.registry import DETECTORS, build_from_cfg
    from demf_tpu.zoo import load_model_cfg, synth_demf_batch

    cfg = load_model_cfg('demf/demf_votenet.py')
    model = build_from_cfg(cfg.model, DETECTORS)
    batch = synth_demf_batch(b=2, p=4096, hw=(128, 160),
                             valid_hw=(120, 156), seed=3)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    tmpl = flatten_params(variables['params'])
    torch.manual_seed(0)
    tm = DeMFVoteNetMimic(tmpl).eval()
    for m in tm.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.normal_(std=0.1)
            m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    new_vars, _ = port_demf_checkpoint(sd, dict(variables), strict=True)

    # flax forward with ported weights
    results = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(new_vars, batch)
    stages = results['decode_res_all']

    # torch forward with the same weights
    with torch.no_grad():
        t_out = t_demf_forward(
            tm,
            torch.from_numpy(np.asarray(batch['points'])),
            torch.from_numpy(
                np.asarray(batch['img']).transpose(0, 3, 1, 2)).float(),
            torch.from_numpy(np.asarray(batch['img_meta']['img_shape'])),
            torch.from_numpy(np.asarray(batch['img_meta']['depth2img'])),
            dict(num_points=(2048, 1024, 512, 256),
                 radius=(0.2, 0.4, 0.8, 1.2), num_samples=(64, 32, 16, 16)))

    def diff(a, t):
        a = np.asarray(a, np.float32)
        t = t.numpy().astype(np.float32)
        assert a.shape == t.shape, (a.shape, t.shape)
        scale = max(np.abs(t).max(), 1e-3)
        return np.abs(a - t).max() / scale

    # intermediates localize any future regression
    assert diff(results['aggregated_points'], t_out['agg_xyz']) < 1e-4
    # final predictions of both stages: the parity claim
    for si, t_dec in ((0, t_out['dec0']), (1, t_out['dec1'])):
        for k in ('center', 'size', 'dir_class', 'dir_res_norm',
                  'obj_scores', 'sem_scores'):
            d = diff(stages[si][k], t_dec[k])
            assert d < 2e-3, (si, k, d)
