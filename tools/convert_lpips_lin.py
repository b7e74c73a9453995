"""One-time conversion of the reference's bundled LPIPS lin-head weights.

The reference ships the learned 1x1 LPIPS heads in-repo
(reference pretrained/vgg_lpips.pth, 7 KB, loaded at
modeling/modules/lpips.py:27-37). This converts them to the framework's
native msgpack zoo format at maskbit_tpu/assets/vgg_lpips_lin.msgpack so
LPIPS runs with the REAL heads by default (the VGG16 backbone remains
env-gated: torchvision weights are not redistributable in-repo).

Usage:
    python tools/convert_lpips_lin.py [src.pth] [dst.msgpack]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maskbit_tpu.compat.torch_convert import load_torch_state_dict
from maskbit_tpu.core.checkpoint import save_pretrained
from maskbit_tpu.losses.lpips import convert_lpips_weights


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/pretrained/vgg_lpips.pth"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "maskbit_tpu", "assets", "vgg_lpips_lin.msgpack",
        )
    )
    state = load_torch_state_dict(src)
    params = convert_lpips_weights(state)["params"]
    save_pretrained(params, dst)
    total = sum(v["kernel"].size for v in params.values())
    print(f"wrote {dst}: {sorted(params)} ({total} weights)")


if __name__ == "__main__":
    main()
