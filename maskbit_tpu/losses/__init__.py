from maskbit_tpu.losses import gan
from maskbit_tpu.losses.lpips import LPIPS, load_lpips_params
from maskbit_tpu.losses.mlm import MLMLossConfig, mlm_loss
from maskbit_tpu.losses.perceptual import PerceptualLoss, convert_resnet50_state
from maskbit_tpu.losses.vqgan import (
    LecamState,
    VQGANLossConfig,
    calculate_adaptive_weight,
    discriminator_loss,
    generator_loss,
    nll_loss_only,
    reconstruction_loss_fn,
)


def create_perception_loss(name: str, compute_on_logits: bool = True):
    """Factory mirroring reference losses.py:11-29, plus 'none' for
    environments without pretrained backbone weights (returns zeros)."""
    if name == "lpips":
        return LPIPS()
    if name in ("resnet50", "convnext_s"):
        return PerceptualLoss(model_name=name, compute_on_logits=compute_on_logits)
    if name == "none":
        return None
    raise ValueError(f"Perception loss {name} is not supported.")


__all__ = [
    "gan",
    "LPIPS",
    "load_lpips_params",
    "MLMLossConfig",
    "mlm_loss",
    "PerceptualLoss",
    "convert_resnet50_state",
    "LecamState",
    "VQGANLossConfig",
    "calculate_adaptive_weight",
    "discriminator_loss",
    "generator_loss",
    "nll_loss_only",
    "reconstruction_loss_fn",
    "create_perception_loss",
]
