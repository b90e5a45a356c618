"""Independent PyTorch oracles for golden-parity tests.

These rebuild the reference architectures from torch primitives following the
behavioral spec in SURVEY.md (§C7, §C11) so the JAX models + converters can
be validated numerically without network access to the original weights.
They are test fixtures only — the framework itself never imports torch.
"""

import torch
from torch import nn


class TorchNonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local block per SURVEY.md §C7 (reference
    src/i3d.py:124-195): theta from x, phi/g from spatially max-pooled x,
    scaled softmax over flattened THW, out conv + BN + residual."""

    def __init__(self, dim, dim_inner):
        super().__init__()
        self.dim_inner = dim_inner
        self.theta = nn.Conv3d(dim, dim_inner, kernel_size=1)
        self.maxpool = nn.MaxPool3d(kernel_size=(1, 2, 2), stride=(1, 2, 2))
        self.phi = nn.Conv3d(dim, dim_inner, kernel_size=1)
        self.g = nn.Conv3d(dim, dim_inner, kernel_size=1)
        self.out = nn.Conv3d(dim_inner, dim, kernel_size=1)
        self.bn = nn.BatchNorm3d(dim)

    def forward(self, x):
        residual = x
        bsz = x.shape[0]
        mp = self.maxpool(x)
        theta = self.theta(x)
        phi, g = self.phi(mp), self.g(mp)
        shape5d = theta.shape
        theta = theta.view(bsz, self.dim_inner, -1)
        phi = phi.view(bsz, self.dim_inner, -1)
        g = g.view(bsz, self.dim_inner, -1)
        attn = torch.softmax(
            torch.bmm(theta.transpose(1, 2), phi) * self.dim_inner ** -0.5,
            dim=-1,
        )
        t = torch.bmm(g, attn.transpose(1, 2)).view(shape5d)
        return self.bn(self.out(t)) + residual


class TorchBottleneck(nn.Module):
    """3D bottleneck per SURVEY.md §C7 (reference src/i3d.py:60-121)."""

    def __init__(self, inplanes, planes, stride, downsample, temp_conv,
                 temp_stride, use_nl=False):
        super().__init__()
        self.conv1 = nn.Conv3d(
            inplanes, planes,
            kernel_size=(1 + temp_conv * 2, 1, 1),
            stride=(temp_stride, 1, 1),
            padding=(temp_conv, 0, 0), bias=False,
        )
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(
            planes, planes, kernel_size=(1, 3, 3),
            stride=(1, stride, stride), padding=(0, 1, 1), bias=False,
        )
        self.bn2 = nn.BatchNorm3d(planes)
        self.conv3 = nn.Conv3d(planes, planes * 4, kernel_size=1, bias=False)
        self.bn3 = nn.BatchNorm3d(planes * 4)
        self.downsample = downsample
        self.nl = (
            TorchNonLocalBlock(planes * 4, planes * 2) if use_nl else None
        )

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        residual = x if self.downsample is None else self.downsample(x)
        out = torch.relu(out + residual)
        return out if self.nl is None else self.nl(out)


class TorchI3Res50(nn.Module):
    """I3Res50 (tushar-n) topology per SURVEY.md §C7; ``use_nl`` adds
    non-local blocks to every odd block of layers 2-3 (nonlocal_mod=2,
    reference src/i3d.py:219,296)."""

    def __init__(self, layers=(3, 4, 6, 3), use_nl=False):
        super().__init__()
        self.use_nl = use_nl
        self.inplanes = 64
        self.conv1 = nn.Conv3d(
            3, 64, kernel_size=(5, 7, 7), stride=(2, 2, 2), padding=(2, 3, 3),
            bias=False,
        )
        self.bn1 = nn.BatchNorm3d(64)
        self.maxpool1 = nn.MaxPool3d(kernel_size=(2, 3, 3), stride=(2, 2, 2))
        self.maxpool2 = nn.MaxPool3d(kernel_size=(2, 1, 1), stride=(2, 1, 1))
        self.layer1 = self._make_layer(64, layers[0], 1, [1, 1, 1], [1, 1, 1])
        self.layer2 = self._make_layer(
            128, layers[1], 2, [1, 0, 1, 0], [1] * 4, nl=use_nl)
        self.layer3 = self._make_layer(
            256, layers[2], 2, [1, 0, 1, 0, 1, 0], [1] * 6, nl=use_nl)
        self.layer4 = self._make_layer(512, layers[3], 2, [0, 1, 0], [1] * 3)
        self.avgpool = nn.AdaptiveAvgPool3d((1, 1, 1))

    def _make_layer(self, planes, blocks, stride, temp_conv, temp_stride,
                    nl=False):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4 or temp_stride[0] != 1:
            downsample = nn.Sequential(
                nn.Conv3d(
                    self.inplanes, planes * 4, kernel_size=1,
                    stride=(temp_stride[0], stride, stride), bias=False,
                ),
                nn.BatchNorm3d(planes * 4),
            )
        layers = [TorchBottleneck(
            self.inplanes, planes, stride, downsample, temp_conv[0], temp_stride[0]
        )]
        self.inplanes = planes * 4
        for i in range(1, blocks):
            layers.append(TorchBottleneck(
                self.inplanes, planes, 1, None, temp_conv[i], temp_stride[i],
                use_nl=nl and i % 2 == 1,
            ))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool1(torch.relu(self.bn1(self.conv1(x))))
        x = self.maxpool2(self.layer1(x))
        x = self.layer4(self.layer3(self.layer2(x)))
        return self.avgpool(x)


def randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so parity tests catch
    mean/var mapping mistakes."""
    gen = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
            mod.running_mean.copy_(torch.randn(mod.num_features, generator=gen) * 0.1)
            mod.running_var.copy_(torch.rand(mod.num_features, generator=gen) + 0.5)
            mod.weight.data.copy_(torch.rand(mod.num_features, generator=gen) + 0.5)
            mod.bias.data.copy_(torch.randn(mod.num_features, generator=gen) * 0.1)


# ---------------------------------------------------------------------------
# MGFN oracle (behavioral spec: SURVEY.md §C11/§C12, reference
# src/models/mgfn/modeling_mgfn.py + src/loss/). Built from torch primitives
# as an independent numerical oracle for the JAX implementation.
# ---------------------------------------------------------------------------

class OracleChanLN(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.g = nn.Parameter(torch.ones(1, dim, 1))
        self.b = nn.Parameter(torch.zeros(1, dim, 1))

    def forward(self, x):  # (B, C, T)
        std = torch.var(x, dim=1, unbiased=False, keepdim=True).sqrt()
        mean = torch.mean(x, dim=1, keepdim=True)
        return (x - mean) / (std + self.eps) * self.g + self.b


class OracleFFN(nn.Module):
    def __init__(self, dim, repe=4, dropout=0.0):
        super().__init__()
        self.layer_norm = OracleChanLN(dim)
        self.in_conv = nn.Conv1d(dim, dim * repe, 1)
        self.out_conv = nn.Conv1d(dim * repe, dim, 1)
        self.drop = nn.Dropout(dropout)

    def forward(self, x):
        return self.out_conv(self.drop(torch.nn.functional.gelu(
            self.in_conv(self.layer_norm(x)))))


class OracleGlanceAttn(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.heads, self.scale = heads, dim_head ** -0.5
        inner = dim_head * heads
        self.norm = OracleChanLN(dim)
        self.to_qkv = nn.Conv1d(dim, inner * 3, 1, bias=False)
        self.to_out = nn.Conv1d(inner, dim, 1)

    def forward(self, x):  # (B, C, T)
        x = self.norm(x)
        q, k, v = self.to_qkv(x).chunk(3, dim=1)
        b, _, t = q.shape
        h = self.heads
        def split(a):  # (b, h*d, t) -> (b, h, t, d)
            return a.view(b, h, -1, t).permute(0, 1, 3, 2)
        q, k, v = split(q) * self.scale, split(k), split(v)
        attn = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        out = attn @ v  # (b, h, t, d)
        out = out.permute(0, 1, 3, 2).reshape(b, -1, t)
        return self.to_out(out)


class OracleFocusAttn(nn.Module):
    def __init__(self, dim, heads, dim_head, kernel):
        super().__init__()
        self.heads = heads
        inner = dim_head * heads
        self.norm = nn.BatchNorm1d(dim)
        self.to_v = nn.Conv1d(dim, inner, 1, bias=False)
        self.rel_pos = nn.Conv1d(heads, heads, kernel,
                                 padding=kernel // 2, groups=heads)
        self.to_out = nn.Conv1d(inner, dim, 1)

    def forward(self, x):  # (B, C, T)
        x = self.norm(x)
        v = self.to_v(x)
        b, c, t = v.shape
        h = self.heads
        # rearrange "b (c h) t -> (b c) h t"
        v = v.view(b, c // h, h, t).reshape(b * (c // h), h, t)
        out = self.rel_pos(v)
        out = out.view(b, c // h, h, t).reshape(b, c, t)
        return self.to_out(out)


class OracleBlock(nn.Module):
    def __init__(self, kind, dim, heads, dim_head=64, ff_repe=4, kernel=5):
        super().__init__()
        self.scc = nn.Conv1d(dim, dim, 3, padding=1)
        if kind == "gb":
            self.attention = OracleGlanceAttn(dim, heads, dim_head)
        else:
            self.attention = OracleFocusAttn(dim, heads, dim_head, kernel)
        self.ffn = OracleFFN(dim, ff_repe)

    def forward(self, x):
        x = self.scc(x) + x
        x = self.attention(x) + x
        return self.ffn(x) + x


class OracleIntermediate(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.layer_norm = OracleChanLN(in_dim)
        self.conv = nn.Conv1d(in_dim, out_dim, 1)

    def forward(self, x):
        return self.conv(self.layer_norm(x))


class OracleMGFN(nn.Module):
    """Full MGFN scorer oracle with the reference's selection + loss math."""

    def __init__(self, dims=(64, 128, 1024), depths=(3, 3, 2),
                 types=("gb", "fb", "fb"), channels=2048, dim_head=64,
                 mag_ratio=0.1, k=3):
        super().__init__()
        self.mag_ratio, self.k = mag_ratio, k
        self.channels = channels
        self.to_tokens = nn.Conv1d(channels, dims[0], 3, padding=1)
        self.to_mag = nn.Conv1d(1, dims[0], 3, padding=1)
        stages = []
        for i, (depth, kind) in enumerate(zip(depths, types)):
            blocks = [OracleBlock(kind, dims[i], dims[i] // dim_head,
                                  dim_head=dim_head)
                      for _ in range(depth)]
            if i != len(depths) - 1:
                blocks.append(OracleIntermediate(dims[i], dims[i + 1]))
            stages.append(nn.Sequential(*blocks))
        self.layers = nn.Sequential(*stages)
        self.layer_norm = nn.LayerNorm(dims[-1])
        self.fc = nn.Linear(dims[-1], 1)

    def forward(self, video, force_split=False):
        bs, ncrops, t, c = video.shape
        x = video.view(bs * ncrops, t, c).permute(0, 2, 1)
        x_f = (
            self.to_tokens(x[:, : self.channels])
            + self.mag_ratio * self.to_mag(x[:, self.channels :])
        )
        x = self.layers(x_f).permute(0, 2, 1)  # (bs*ncrops, t, f)
        x = self.layer_norm(x)
        scores = torch.sigmoid(self.fc(x))

        feat_mag = torch.norm(x, p=2, dim=2).view(bs, ncrops, -1).mean(1)
        scores_avg = scores.view(bs, ncrops, -1).mean(1).unsqueeze(2)

        if force_split:
            half = bs // 2
            nf, af = x[: half * ncrops], x[half * ncrops:]
            ns, as_ = scores_avg[:half], scores_avg[half:]
            nm, am = feat_mag[:half], feat_mag[half:]
        else:
            nf = af = x
            ns = as_ = scores_avg
            nm = am = feat_mag

        def select(mag, feats, sc):
            n = mag.shape[0]
            idx = torch.topk(mag, self.k, dim=1)[1]
            idx_f = idx.unsqueeze(2).expand(-1, -1, feats.shape[2])
            f = feats.view(n, ncrops, t, -1).permute(1, 0, 2, 3)
            sel = torch.cat([torch.gather(fc_, 1, idx_f) for fc_ in f])
            idx_s = idx.unsqueeze(2)
            return sel, torch.mean(torch.gather(sc, 1, idx_s), dim=1)

        a_sel, score_ab = select(am, af, as_)
        n_sel, score_no = select(nm, nf, ns)
        return score_ab, score_no, a_sel, n_sel, scores_avg


def oracle_losses(score_ab, score_no, a_sel, n_sel, alabels, nlabels,
                  scores_avg, bs):
    """Reference loss composition (modeling_mgfn.py:406-418, src/loss/*)."""
    sm = 8e-4 * torch.sum(
        (scores_avg[:, 1:, :] - scores_avg[:, :-1, :]) ** 2)
    sp = 8e-3 * torch.mean(torch.norm(
        scores_avg[: bs // 2].reshape(-1), dim=0))

    def contrast(o1, o2, label, margin=200.0):
        d = torch.nn.functional.pairwise_distance(o1, o2, keepdim=True)
        return torch.mean((1 - label) * d ** 2
                          + label * torch.clamp(margin - d, min=0.0) ** 2)

    labels = torch.cat((nlabels, alabels), 0)
    scores = torch.cat((score_no, score_ab), 0).squeeze()
    sep = len(n_sel) // 2
    loss_cls = torch.nn.functional.binary_cross_entropy(scores, labels)
    a_l1 = torch.norm(a_sel, p=1, dim=2)
    n_l1 = torch.norm(n_sel, p=1, dim=2)
    con = contrast(a_l1, n_l1, 1)
    con_n = contrast(n_l1[sep:], n_l1[:sep], 0)
    con_a = contrast(a_l1[sep:], a_l1[:sep], 0)
    alpha = 0.001
    return loss_cls + alpha * (alpha * con + con_a + con_n) + sm + sp


# ---------------------------------------------------------------------------
# pytorchvideo create_resnet oracle (behavioral spec: SURVEY.md §C7; reference
# src/i3d.py:339-350 builds pytorchvideo 0.1.3 create_resnet with hub i3d_r50
# overrides). Hand-written from torch primitives with pytorchvideo's exact
# module tree so state_dict() keys match the real I3D_8x8_R50.pyth layout —
# including the index shift from the stage1 MaxPool being appended as its own
# top-level block (blocks: stem=0, stage1=1, pool=2, stages 3/4/5, head=6).
# ---------------------------------------------------------------------------


class _PtvBottleneckBranch(nn.Module):
    """pytorchvideo create_bottleneck_block: conv_a/norm_a/act -> conv_b/
    norm_b/act -> conv_c/norm_c (no final act; the ResBlock adds+relu)."""

    def __init__(self, dim_in, dim_inner, dim_out, a_kernel, a_stride, b_stride):
        super().__init__()
        self.conv_a = nn.Conv3d(
            dim_in, dim_inner, a_kernel, stride=a_stride,
            padding=tuple(k // 2 for k in a_kernel), bias=False,
        )
        self.norm_a = nn.BatchNorm3d(dim_inner)
        self.conv_b = nn.Conv3d(
            dim_inner, dim_inner, (1, 3, 3), stride=b_stride,
            padding=(0, 1, 1), bias=False,
        )
        self.norm_b = nn.BatchNorm3d(dim_inner)
        self.conv_c = nn.Conv3d(dim_inner, dim_out, 1, bias=False)
        self.norm_c = nn.BatchNorm3d(dim_out)

    def forward(self, x):
        x = torch.relu(self.norm_a(self.conv_a(x)))
        x = torch.relu(self.norm_b(self.conv_b(x)))
        return self.norm_c(self.conv_c(x))


class _PtvResBlock(nn.Module):
    def __init__(self, dim_in, dim_inner, dim_out, a_kernel, a_stride, b_stride):
        super().__init__()
        total_stride = tuple(a * b for a, b in zip(a_stride, b_stride))
        if dim_in != dim_out or any(s > 1 for s in total_stride):
            self.branch1_conv = nn.Conv3d(
                dim_in, dim_out, 1, stride=total_stride, bias=False
            )
            self.branch1_norm = nn.BatchNorm3d(dim_out)
        else:
            self.branch1_conv = None
        self.branch2 = _PtvBottleneckBranch(
            dim_in, dim_inner, dim_out, a_kernel, a_stride, b_stride
        )

    def forward(self, x):
        shortcut = (
            x if self.branch1_conv is None
            else self.branch1_norm(self.branch1_conv(x))
        )
        return torch.relu(shortcut + self.branch2(x))


class _PtvResStage(nn.Module):
    def __init__(self, depth, dim_in, dim_inner, dim_out, a_kernels,
                 a_stride, b_stride):
        super().__init__()
        self.res_blocks = nn.ModuleList([
            _PtvResBlock(
                dim_in if i == 0 else dim_out, dim_inner, dim_out,
                a_kernels[i % len(a_kernels)],
                a_stride if i == 0 else (1, 1, 1),
                b_stride if i == 0 else (1, 1, 1),
            )
            for i in range(depth)
        ])

    def forward(self, x):
        for block in self.res_blocks:
            x = block(x)
        return x


class _PtvStem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv3d(
            3, 64, (5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3), bias=False
        )
        self.norm = nn.BatchNorm3d(64)
        self.pool = nn.MaxPool3d((1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))

    def forward(self, x):
        return self.pool(torch.relu(self.norm(self.conv(x))))


class _PtvPoolerHead(nn.Module):
    """The reference's create_res_pooler(direct_pool=False): AvgPool3d with
    create_resnet's head_pool_kernel_size=(4,7,7), stride (1,1,1), then
    global average (src/i3d.py:21-57)."""

    def __init__(self):
        super().__init__()
        self.pool = nn.AvgPool3d((4, 7, 7), stride=(1, 1, 1), padding=0)
        self.output_pool = nn.AdaptiveAvgPool3d(1)

    def forward(self, x):
        return self.output_pool(self.pool(x))


class TorchI3D8x8R50(nn.Module):
    """pytorchvideo create_resnet(stem (5,7,7), stage1_pool MaxPool3d,
    hub-i3d_r50 conv_a kernels, pooler head) per reference src/i3d.py:339-350.

    blocks layout matches pytorchvideo 0.1.3 create_resnet: the stage1 pool
    is appended as a separate top-level block, so state-dict stage indices
    are 1, 3, 4, 5 (NOT 1-4).
    """

    # per-stage conv_a temporal kernel cycles (hub/resnet.py#L19 overrides)
    A_KERNELS = (
        ((3, 1, 1),),
        ((3, 1, 1), (1, 1, 1)),
        ((3, 1, 1), (1, 1, 1)),
        ((1, 1, 1), (3, 1, 1)),
    )

    def __init__(self, depths=(3, 4, 6, 3)):
        super().__init__()
        blocks = [_PtvStem()]
        dim_in = 64
        for idx, depth in enumerate(depths):
            dim_inner = 64 * 2 ** idx
            dim_out = 256 * 2 ** idx
            spatial = 1 if idx == 0 else 2
            blocks.append(_PtvResStage(
                depth, dim_in, dim_inner, dim_out, self.A_KERNELS[idx],
                a_stride=(1, 1, 1),  # stage_temporal_stride default (1,1,1,1)
                b_stride=(1, spatial, spatial),
            ))
            dim_in = dim_out
            if idx == 0:  # stage1_pool appended as its own block
                blocks.append(nn.MaxPool3d((2, 1, 1), stride=(2, 1, 1)))
        blocks.append(_PtvPoolerHead())
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        for block in self.blocks:
            x = block(x)
        return x


# ---------------------------------------------------------------------------
# RTFM oracle (behavioral spec: models/rtfm/model.py, the second model
# family filling the reference's empty src/models/rtfm/ slot). Module names
# follow the official RTFM release (tianyu0207/RTFM model.py: Aggregate with
# conv_1..conv_5 Sequentials + non_local, fc1-3 head) so state_dict() keys
# define the interchange contract for utils/convert.convert_rtfm_state_dict.
# ---------------------------------------------------------------------------


class OracleRTFMNonLocal(nn.Module):
    """Embedded-Gaussian non-local block over clips, mean-normalized."""

    def __init__(self, in_channels, inter_channels):
        super().__init__()
        self.theta = nn.Conv1d(in_channels, inter_channels, 1)
        self.phi = nn.Conv1d(in_channels, inter_channels, 1)
        self.g = nn.Conv1d(in_channels, inter_channels, 1)
        self.W = nn.Sequential(nn.Conv1d(inter_channels, in_channels, 1))

    def forward(self, x):  # (B, C, T)
        theta, phi, g = self.theta(x), self.phi(x), self.g(x)
        attn = torch.einsum("bci,bcj->bij", theta, phi) / x.shape[-1]
        out = torch.einsum("bij,bcj->bci", attn, g)
        return self.W(out) + x


class OracleRTFMAggregate(nn.Module):
    """Dilated temporal pyramid + non-local branch + k3 fuse, residual."""

    def __init__(self, channels=2048):
        super().__init__()
        branch = channels // 4

        def dilated(d):
            return nn.Sequential(
                nn.Conv1d(channels, branch, 3, dilation=d, padding=d)
            )

        self.conv_1 = dilated(1)
        self.conv_2 = dilated(2)
        self.conv_3 = dilated(4)
        self.conv_4 = nn.Sequential(nn.Conv1d(channels, branch, 1, bias=False))
        self.conv_5 = nn.Sequential(nn.Conv1d(channels, channels, 3, padding=1))
        self.non_local = OracleRTFMNonLocal(branch, branch // 2)

    def forward(self, x):  # (B, C, T)
        y1 = torch.relu(self.conv_1(x))
        y2 = torch.relu(self.conv_2(x))
        y3 = torch.relu(self.conv_3(x))
        z = self.non_local(self.conv_4(x))
        out = torch.cat([y1, y2, y3, z], dim=1)
        return torch.relu(self.conv_5(out)) + x


class OracleRTFM(nn.Module):
    """Inference-path RTFM scorer: Aggregate features -> 3-layer MLP ->
    sigmoid, crop-averaged (models/rtfm/model.py eval semantics)."""

    def __init__(self, channels=2048, hidden=(512, 128)):
        super().__init__()
        self.Aggregate = OracleRTFMAggregate(channels)
        self.fc1 = nn.Linear(channels, hidden[0])
        self.fc2 = nn.Linear(hidden[0], hidden[1])
        self.fc3 = nn.Linear(hidden[1], 1)

    def forward(self, video):  # (bs, ncrops, t, channels)
        bs, ncrops, t, c = video.shape
        x = video.reshape(bs * ncrops, t, c).permute(0, 2, 1)
        feats = self.Aggregate(x).permute(0, 2, 1)  # (B, T, C)
        h = torch.relu(self.fc1(feats))
        h = torch.relu(self.fc2(h))
        scores = torch.sigmoid(self.fc3(h))  # (B, T, 1)
        return scores.view(bs, ncrops, t).mean(1)[..., None]


class OracleSultani(nn.Module):
    """Sultani CVPR 2018 MIL-ranking scorer in the common pytorch-port
    layout (fc1/fc2/fc3): relu(fc1) -> drop -> fc2 -> drop -> sigmoid(fc3),
    crop-averaged (models/sultani/model.py semantics; dropout identity in
    eval mode)."""

    def __init__(self, channels=2048, hidden=(512, 32)):
        super().__init__()
        self.fc1 = nn.Linear(channels, hidden[0])
        self.fc2 = nn.Linear(hidden[0], hidden[1])
        self.fc3 = nn.Linear(hidden[1], 1)

    def forward(self, video):  # (bs, ncrops, t, channels)
        bs, ncrops, t, c = video.shape
        x = video.reshape(bs * ncrops, t, c)
        h = torch.relu(self.fc1(x))
        h = self.fc2(h)
        scores = torch.sigmoid(self.fc3(h))  # (B, T, 1)
        return scores.view(bs, ncrops, t).mean(1)[..., None]

    def ranking_loss(self, video, lambda1=8e-5, lambda2=8e-5):
        """Paper eq. 3 on a normal-first concatenated batch: pairwise hinge
        on segment-score maxima + smoothness/sparsity on the abnormal bag."""
        scores = self.forward(video)[..., 0]  # (bs, t)
        half = scores.shape[0] // 2
        n, a = scores[:half], scores[half:]
        hinge = torch.relu(1.0 - a.max(dim=1).values + n.max(dim=1).values)
        smooth = ((a[:, 1:] - a[:, :-1]) ** 2).sum(dim=1)
        sparse = a.sum(dim=1)
        return (hinge + lambda1 * smooth + lambda2 * sparse).mean()
