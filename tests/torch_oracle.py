"""Torch oracle of the maskrcnn_tpu architecture, for conversion tests.

A fresh PyTorch implementation written from THIS framework's module
specs (models/resnet.py, fpn.py, rpn.py, heads.py) with attribute names
chosen so `to_torch_state_dict` keys load directly — used to verify the
flax model + weight converter reproduce identical numerics end-to-end.
It intentionally mirrors the architecture the reference also implements
(standard ResNet-FPN Mask R-CNN), but is derived from our spec, not the
reference's code.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

BN_EPS = 1e-3


def _bn(c):
    return nn.BatchNorm2d(c, eps=BN_EPS)


class OracleBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, stride=stride)
        self.bn1 = _bn(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.bn2 = _bn(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1)
        self.bn3 = _bn(planes * 4)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride),
                _bn(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + r)


def _stage(inplanes, planes, blocks, stride):
    layers = [OracleBottleneck(inplanes, planes, stride, downsample=True)]
    for _ in range(1, blocks):
        layers.append(OracleBottleneck(planes * 4, planes))
    return nn.Sequential(*layers)


class OracleStemPool(nn.Module):
    """SamePad(3,2)+MaxPool(3,2): asymmetric (0,1) zero pad."""

    def forward(self, x):
        return F.max_pool2d(F.pad(x, (0, 1, 0, 1)), 3, 2)


class OracleFPN(nn.Module):
    """ResNet-FPN with torch key names matching checkpoint/name_map."""

    def __init__(self, architecture="resnet50", out_channels=256):
        super().__init__()
        blocks = {"resnet50": [3, 4, 6, 3],
                  "resnet101": [3, 4, 23, 3]}[architecture]
        self.C1 = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3), _bn(64),
            nn.ReLU(), OracleStemPool())
        self.C2 = _stage(64, 64, blocks[0], 1)
        self.C3 = _stage(256, 128, blocks[1], 2)
        self.C4 = _stage(512, 256, blocks[2], 2)
        self.C5 = _stage(1024, 512, blocks[3], 2)
        for lvl, cin in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
            setattr(self, f"P{lvl}_conv1",
                    nn.Conv2d(cin, out_channels, 1))
            setattr(self, f"P{lvl}_conv2", nn.Sequential(
                nn.Identity(),
                nn.Conv2d(out_channels, out_channels, 3, padding=1)))

    def forward(self, x):
        c2 = self.C2(self.C1(x))
        c3 = self.C3(c2)
        c4 = self.C4(c3)
        c5 = self.C5(c4)
        p5 = self.P5_conv1(c5)
        p4 = self.P4_conv1(c4) + F.interpolate(p5, scale_factor=2)
        p3 = self.P3_conv1(c3) + F.interpolate(p4, scale_factor=2)
        p2 = self.P2_conv1(c2) + F.interpolate(p3, scale_factor=2)
        p5 = self.P5_conv2(p5)
        p4 = self.P4_conv2(p4)
        p3 = self.P3_conv2(p3)
        p2 = self.P2_conv2(p2)
        p6 = p5[:, :, ::2, ::2]
        return [p2, p3, p4, p5, p6]


class OracleRPN(nn.Module):
    def __init__(self, anchors_per_location=3):
        super().__init__()
        a = anchors_per_location
        self.conv_shared = nn.Conv2d(256, 512, 3, padding=1)
        self.conv_class = nn.Conv2d(512, 2 * a, 1)
        self.conv_bbox = nn.Conv2d(512, 4 * a, 1)

    def forward(self, x):
        s = F.relu(self.conv_shared(x))
        logits = self.conv_class(s).permute(0, 2, 3, 1).reshape(
            x.shape[0], -1, 2)
        bbox = self.conv_bbox(s).permute(0, 2, 3, 1).reshape(
            x.shape[0], -1, 4)
        return logits, bbox


class OracleBoxHead(nn.Module):
    def __init__(self, num_classes, pool_size=7):
        super().__init__()
        self.conv1 = nn.Conv2d(256, 1024, pool_size)
        self.bn1 = _bn(1024)
        self.conv2 = nn.Conv2d(1024, 1024, 1)
        self.bn2 = _bn(1024)
        self.linear_class = nn.Linear(1024, num_classes)
        self.linear_bbox = nn.Linear(1024, num_classes * 4)

    def forward(self, pooled):
        x = F.relu(self.bn1(self.conv1(pooled)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = x.reshape(-1, 1024)
        return (self.linear_class(x),
                self.linear_bbox(x).reshape(-1, self.linear_class.
                                            out_features, 4))


class OracleMaskHead(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f"conv{i}", nn.Conv2d(256, 256, 3, padding=1))
            setattr(self, f"bn{i}", _bn(256))
        self.deconv = nn.ConvTranspose2d(256, 256, 2, stride=2)
        self.conv5 = nn.Conv2d(256, num_classes, 1)

    def forward(self, x):
        for i in range(1, 5):
            x = F.relu(getattr(self, f"bn{i}")(
                getattr(self, f"conv{i}")(x)))
        x = F.relu(self.deconv(x))
        return torch.sigmoid(self.conv5(x))


class OracleMaskRCNN(nn.Module):
    """Container whose state-dict keys match name_map's torch names."""

    def __init__(self, architecture="resnet50", num_classes=81):
        super().__init__()
        self.fpn = OracleFPN(architecture)
        self.rpn = OracleRPN()
        self.classifier = OracleBoxHead(num_classes)
        self.mask = OracleMaskHead(num_classes)
        self.eval()  # frozen BN everywhere
