"""ResNet-50 forward parity: flax port + converter vs a torch ResNet-50
built to torchvision's exact layout (state-dict keys included), with random
weights. Verifies the perceptual-loss backbone and that real torchvision
IMAGENET1K_V1 state dicts will convert correctly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from maskbit_tpu.losses.perceptual import ResNet50, convert_resnet50_state  # noqa: E402


class Bottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(torch.nn.Module):
    """torchvision-layout ResNet-50 (keys: conv1, bn1, layer{1-4}.{i}.*, fc)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3, stride=1)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        self.avgpool = torch.nn.AdaptiveAvgPool2d((1, 1))
        self.fc = torch.nn.Linear(512 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = torch.nn.Sequential(
            torch.nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            torch.nn.BatchNorm2d(planes * 4),
        )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return torch.nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        features = x
        x = torch.flatten(self.avgpool(x), 1)
        return features, self.fc(x)


def test_resnet50_forward_parity(rng):
    torch.manual_seed(6)
    ref = TorchResNet50()
    # randomize BN running stats so the frozen-stats path is actually tested
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    variables = convert_resnet50_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    # converter nests under {'params': {'model': ...}} for PerceptualLoss;
    # unwrap for the bare ResNet50 module
    bare = {"params": variables["params"]["model"]}

    x = rng.uniform(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        feat_t, logit_t = ref(torch.from_numpy(x))
    feat_j, logit_j = ResNet50().apply(bare, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(feat_j).transpose(0, 3, 1, 2), feat_t.numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(np.asarray(logit_j), logit_t.numpy(), atol=2e-3, rtol=1e-2)


class TorchCNBlock(torch.nn.Module):
    """torchvision CNBlock layout (keys block.{0,2,3,5}, layer_scale)."""

    def __init__(self, dim):
        super().__init__()
        self.block = torch.nn.Sequential(
            torch.nn.Conv2d(dim, dim, 7, padding=3, groups=dim),   # 0
            torch.nn.Identity(),                                   # 1 (Permute)
            torch.nn.LayerNorm(dim, eps=1e-6),                      # 2
            torch.nn.Linear(dim, 4 * dim),                          # 3
            torch.nn.GELU(),                                        # 4
            torch.nn.Linear(4 * dim, dim),                          # 5
        )
        self.layer_scale = torch.nn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):
        y = self.block[0](x).permute(0, 2, 3, 1)
        y = self.block[5](self.block[4](self.block[3](self.block[2](y))))
        return x + self.layer_scale * y.permute(0, 3, 1, 2)


class LayerNorm2d(torch.nn.LayerNorm):
    """torchvision LayerNorm2d: per-pixel channel normalization on NCHW."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class TorchConvNeXtSmall(torch.nn.Module):
    """torchvision convnext_small layout (features.{0..7}, classifier)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        depths, dims = (3, 3, 27, 3), (96, 192, 384, 768)
        feats = []
        # stem: Conv2dNormActivation(conv, LayerNorm2d)
        feats.append(torch.nn.Sequential(
            torch.nn.Conv2d(3, dims[0], 4, stride=4),
            LayerNorm2d(dims[0], eps=1e-6),
        ))
        for stage, (depth, dim) in enumerate(zip(depths, dims)):
            if stage > 0:
                feats.append(torch.nn.Sequential(
                    LayerNorm2d(dims[stage - 1], eps=1e-6),
                    torch.nn.Conv2d(dims[stage - 1], dim, 2, stride=2),
                ))
            feats.append(torch.nn.Sequential(*[TorchCNBlock(dim) for _ in range(depth)]))
        self.features = torch.nn.Sequential(*feats)
        self.classifier = torch.nn.Sequential(
            LayerNorm2d(dims[-1], eps=1e-6),
            torch.nn.Flatten(1),
            torch.nn.Linear(dims[-1], num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        features = x
        pooled = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        return features, self.classifier(pooled)


def test_convnext_small_forward_parity(rng):
    from maskbit_tpu.losses.convnext import ConvNeXtSmall, convert_convnext_small_state

    torch.manual_seed(8)
    ref = TorchConvNeXtSmall()
    ref.eval()
    variables = convert_convnext_small_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    bare = {"params": variables["params"]["model"]}

    x = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feat_t, logit_t = ref(torch.from_numpy(x))
    feat_j, logit_j = ConvNeXtSmall().apply(bare, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(feat_j).transpose(0, 3, 1, 2), feat_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(logit_j), logit_t.numpy(), atol=2e-4, rtol=1e-3)
