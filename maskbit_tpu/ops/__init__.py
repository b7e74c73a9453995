from maskbit_tpu.ops.bitops import (
    bits_to_indices,
    codebook,
    combine_factorized_tokens,
    indices_to_bits,
    split_factorized_tokens,
)
from maskbit_tpu.ops.entropy import clamp_log, entropy_loss_fn, lfq_entropy_terms
from maskbit_tpu.ops.masking import get_mask_tokens, get_masking_ratio

__all__ = [
    "bits_to_indices",
    "indices_to_bits",
    "codebook",
    "split_factorized_tokens",
    "combine_factorized_tokens",
    "clamp_log",
    "entropy_loss_fn",
    "lfq_entropy_terms",
    "get_mask_tokens",
    "get_masking_ratio",
]
