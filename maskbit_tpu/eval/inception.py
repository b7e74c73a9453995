"""InceptionV3 feature extractor for FID / Inception Score.

Parity target: reference metrics/inception.py (torch-fidelity's
FeatureExtractorInceptionV3 with the pt-fid weights): uint8 RGB input,
bilinear resize to 299x299, (x-128)/128 scaling, the FID-variant Inception
blocks (avg-pool with count_include_pad=False in A/C/E_1, max-pool branch in
E_2), and two heads: '2048' pool features and 'logits_unbiased'
(fc without bias, 1008 classes).

Weights convert from the pt-fid checkpoint
(https://github.com/mseitzer/pytorch-fid weights, same key layout as
torchvision inception_v3) via `convert_inception_state`. The reference runs
float64 internals for exactness; on TPU we run float32 compute and
accumulate FID moments in float64 on the host (see eval/fid.py) — validated
to track the reference within FID noise.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class BasicConv2d(nn.Module):
    """conv (no bias) + BN(eps=1e-3, frozen) + relu — torchvision BasicConv2d."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_nocountpad(x, window=3):
    """3x3 stride-1 avg pool, padding=1, count_include_pad=False (the
    FID-variant pooling)."""
    pad = window // 2
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    sum_x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return sum_x / count


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # E_1: FID avg pool; E_2: max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_nocountpad(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def resize_bilinear_tf1(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """TF1-exact legacy bilinear resize (align_corners=False, NO half-pixel
    centers) on NHWC float input.

    This is the convention the reference's FID front end uses — reference
    metrics/inception.py:92-96 calls torch_fidelity's
    `interpolate_bilinear_2d_like_tensorflow1x` — and what the OpenAI ADM
    TF1 frozen graph applies internally (reference
    utils/adm_eval_suite.py:96-116). Published FID protocols depend on it:
    src = dst * (in/out) with no half-pixel offset, floor/floor+1 gather
    clamped to the edge, lerp computed as `a + (b - a) * t`, width axis
    first then height — exactly the torch-fidelity 'slow' kernel's order of
    operations, so float results match it bit-for-bit at equal dtype. The
    half-pixel-center convention (`jax.image.resize` / torch
    `F.interpolate`) samples up to half a source pixel away near the
    borders, which shifts FID by tenths — larger than the gaps between the
    paper's own models (reference README.md:69-78).
    """
    b, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x  # scale=1 makes the TF1 kernel a bit-exact identity

    def grid(in_size: int, out_size: int):
        scale = np.float32(in_size / out_size)
        src = np.arange(out_size, dtype=np.float32) * scale
        lo = np.minimum(np.floor(src), in_size - 1).astype(np.int32)
        hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
        t = src - lo.astype(np.float32)
        return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(t, x.dtype)

    lo_x, hi_x, t_x = grid(in_w, out_w)
    lo_y, hi_y, t_y = grid(in_h, out_h)
    left = jnp.take(x, lo_x, axis=2)
    right = jnp.take(x, hi_x, axis=2)
    x = left + (right - left) * t_x[None, None, :, None]
    top = jnp.take(x, lo_y, axis=1)
    bottom = jnp.take(x, hi_y, axis=1)
    return top + (bottom - top) * t_y[None, :, None, None]


class InceptionV3(nn.Module):
    """FID-variant InceptionV3. Input: float RGB in [0, 255], NHWC, any size.

    Returns {'2048': pool features, 'logits_unbiased': 1008 logits}.
    """

    num_classes: int = 1008

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = resize_bilinear_tf1(x.astype(jnp.float32), 299, 299)
        x = (x - 128.0) / 128.0

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)

        pooled = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (b, 2048)
        fc_kernel = self.param(
            "fc_kernel", nn.initializers.lecun_normal(), (2048, self.num_classes)
        )
        # 'logits_unbiased' = features @ W.T (torch-fidelity drops the bias)
        logits_unbiased = pooled @ fc_kernel
        return {"2048": pooled, "logits_unbiased": logits_unbiased}


def convert_inception_state(state: Mapping[str, np.ndarray]) -> Dict:
    """pt-fid / torchvision inception_v3 state dict -> InceptionV3 params."""
    params: Dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in state.items():
        value = np.asarray(value)
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(("fc_kernel",), value.T)
            continue  # fc bias unused by logits_unbiased
        if parts[0].startswith("AuxLogits"):
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / .bn.weight/.bn.running_mean
        *module_path, layer, leaf = parts
        path = tuple(module_path)
        if layer == "conv" and leaf == "weight":
            put(path + ("conv", "kernel"), value.transpose(2, 3, 1, 0))
        elif layer == "bn":
            name = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(leaf)
            if name is not None:
                put(path + (name,), value)
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"Unrecognized inception key {key!r}")
    return {"params": params}


def load_inception_params(path: str) -> Dict:
    from maskbit_tpu.compat.torch_convert import load_torch_state_dict

    return convert_inception_state(load_torch_state_dict(path))
