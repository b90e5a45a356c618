"""Independent PyTorch oracles for golden-parity tests.

These rebuild the reference architectures from torch primitives following the
behavioral spec in SURVEY.md (§C7, §C11) so the JAX models + converters can
be validated numerically without network access to the original weights.
They are test fixtures only — the framework itself never imports torch.
"""

import torch
from torch import nn


class TorchBottleneck(nn.Module):
    """3D bottleneck per SURVEY.md §C7 (reference src/i3d.py:60-121)."""

    def __init__(self, inplanes, planes, stride, downsample, temp_conv, temp_stride):
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

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        residual = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + residual)


class TorchI3Res50(nn.Module):
    """I3Res50 (tushar-n) topology per SURVEY.md §C7, no non-local blocks."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv3d(
            3, 64, kernel_size=(5, 7, 7), stride=(2, 2, 2), padding=(2, 3, 3),
            bias=False,
        )
        self.bn1 = nn.BatchNorm3d(64)
        self.maxpool1 = nn.MaxPool3d(kernel_size=(2, 3, 3), stride=(2, 2, 2))
        self.maxpool2 = nn.MaxPool3d(kernel_size=(2, 1, 1), stride=(2, 1, 1))
        self.layer1 = self._make_layer(64, layers[0], 1, [1, 1, 1], [1, 1, 1])
        self.layer2 = self._make_layer(128, layers[1], 2, [1, 0, 1, 0], [1] * 4)
        self.layer3 = self._make_layer(256, layers[2], 2, [1, 0, 1, 0, 1, 0], [1] * 6)
        self.layer4 = self._make_layer(512, layers[3], 2, [0, 1, 0], [1] * 3)
        self.avgpool = nn.AdaptiveAvgPool3d((1, 1, 1))

    def _make_layer(self, planes, blocks, stride, temp_conv, temp_stride):
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
                self.inplanes, planes, 1, None, temp_conv[i], temp_stride[i]
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
