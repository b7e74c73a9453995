"""PyTorch checkpoint -> Flax parameter conversion.

Loads reference model-zoo checkpoints (single `pytorch_model.bin` state
dicts, reference modeling/modules/base_model.py:87-132) into this
framework's parameter trees, including the reference's key-renaming quirks:
  * `token_emb` -> `input_proj` for LFQBert checkpoints
    (reference scripts/eval_maskbit.py:52, demo_utils.py:52)
  * torch MultiheadAttention's packed `in_proj_weight` -> fused qkv kernel
  * OIHW conv kernels -> HWIO
  * `weight`->`kernel`(transposed) / `scale`, buffers dropped.

Works from either a file path (requires torch) or an in-memory mapping of
numpy arrays, so tests can round-trip without touching disk.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(value: Any) -> np.ndarray:
    if isinstance(value, np.ndarray):
        return value
    # torch tensor (avoid importing torch unless needed)
    return value.detach().cpu().numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a PyTorch .bin/.pth state dict as numpy arrays."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: _to_numpy(v) for k, v in state.items()}


def _set_path(tree: Dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _merge_indices(key: str) -> list:
    """'encoder.down.0.res_blocks.1.conv1.weight' ->
    ['encoder', 'down_0', 'res_blocks_1', 'conv1', 'weight']."""
    parts = key.split(".")
    merged: list = []
    for part in parts:
        if part.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{part}"
        else:
            merged.append(part)
    return merged


_SKIP_SUFFIXES = ("bits_to_indices", "codebook", "num_batches_tracked", "kernel_buffer")


def convert_tokenizer_state(state: Mapping[str, np.ndarray]) -> Dict:
    """Reference ConvVQModel state dict -> flax params for models.ConvVQModel.

    Handles both `ConvDecoder` and `ConvDecoderLegacy` checkpoints — the
    naming difference (up-stage index order) is preserved verbatim, so the
    flax model must be constructed with the matching `legacy` flag.
    """
    params: Dict = {}
    for key, value in state.items():
        if key.endswith(_SKIP_SUFFIXES):
            continue
        if key.startswith("loss."):
            # taming checkpoints bundle the training loss module; drop it
            # (reference modeling/taming_vqgan.py:101-113)
            continue
        value = _to_numpy(value)
        parts = _merge_indices(key)
        leaf = parts[-1]
        module_path = tuple(parts[:-1])

        if leaf == "weight":
            if module_path and module_path[-1] == "embedding":
                # VQ codebook: quantize.embedding.weight -> quantize/embedding
                _set_path(params, module_path, value)
                continue
            if value.ndim == 4:  # conv OIHW -> HWIO
                _set_path(params, module_path + ("kernel",), value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:  # linear
                _set_path(params, module_path + ("kernel",), value.T)
            else:  # norm scale
                _set_path(params, module_path + ("scale",), value)
        elif leaf == "bias":
            _set_path(params, module_path + ("bias",), value)
        else:
            raise ValueError(f"Unrecognized tokenizer key {key!r}")
    return {"params": params}


_GEN_ATTN_RE = re.compile(r"^transformer\.layers\.(\d+)\.0\.(.*)$")
_GEN_FFN_RE = re.compile(r"^transformer\.layers\.(\d+)\.1\.(.*)$")


def convert_generator_state(state: Mapping[str, np.ndarray]) -> Dict:
    """Reference Bert/LFQBert state dict -> flax params for models.generator."""
    params: Dict = {}

    def put(path_str: str, value: np.ndarray) -> None:
        _set_path(params, tuple(path_str.split("/")), value)

    for key, value in state.items():
        if key.endswith(_SKIP_SUFFIXES):
            continue
        value = _to_numpy(value)

        # legacy checkpoint rename (reference scripts/eval_maskbit.py:52)
        if key.startswith("token_emb."):
            key = "input_proj." + key[len("token_emb."):]

        if key == "pos_emb":
            put("pos_emb", value)
        elif key == "class_emb.weight":
            put("class_emb/embedding", value)
        elif key.startswith("tok_emb_list."):
            idx = key.split(".")[1]
            put(f"tok_emb_{idx}/embedding", value)
        elif re.match(r"^bias\.\d+$", key):
            idx = key.split(".")[1]
            put(f"bias_{idx}", value)
        elif key.startswith("first_layer.0."):
            leaf = "scale" if key.endswith("weight") else "bias"
            put(f"first_norm/{leaf}", value)
        elif key == "norm_after_transformer.weight":
            put("norm_after_transformer/scale", value)
        elif key == "norm_after_transformer.bias":
            put("norm_after_transformer/bias", value)
        elif key.startswith("last_layer.0."):
            if key.endswith("weight"):
                put("last_dense/kernel", value.T)
            else:
                put("last_dense/bias", value)
        elif key.startswith("last_layer.2."):
            leaf = "scale" if key.endswith("weight") else "bias"
            put(f"last_norm/{leaf}", value)
        elif key.startswith(("input_proj.", "prediction_layer.")):
            module = key.split(".")[0]
            if key.endswith("weight"):
                put(f"{module}/kernel", value.T)
            else:
                put(f"{module}/bias", value)
        elif m := _GEN_ATTN_RE.match(key):
            i, rest = m.group(1), m.group(2)
            base = f"transformer/layers_{i}_attn"
            if rest == "mha.in_proj_weight":
                put(f"{base}/mha/qkv/kernel", value.T)
            elif rest == "mha.in_proj_bias":
                put(f"{base}/mha/qkv/bias", value)
            elif rest == "mha.out_proj.weight":
                put(f"{base}/mha/out_proj/kernel", value.T)
            elif rest == "mha.out_proj.bias":
                put(f"{base}/mha/out_proj/bias", value)
            elif rest == "norm.weight":
                put(f"{base}/norm/scale", value)
            elif rest == "norm.bias":
                put(f"{base}/norm/bias", value)
            else:
                raise ValueError(f"Unrecognized attention key {key!r}")
        elif m := _GEN_FFN_RE.match(key):
            i, rest = m.group(1), m.group(2)
            base = f"transformer/layers_{i}_ffn"
            if rest == "net.0.weight":
                put(f"{base}/fc1/kernel", value.T)
            elif rest == "net.0.bias":
                put(f"{base}/fc1/bias", value)
            elif rest == "net.2.weight":
                put(f"{base}/fc2/kernel", value.T)
            elif rest == "net.2.bias":
                put(f"{base}/fc2/bias", value)
            elif rest == "norm.weight":
                put(f"{base}/norm/scale", value)
            elif rest == "norm.bias":
                put(f"{base}/norm/bias", value)
            else:
                raise ValueError(f"Unrecognized ffn key {key!r}")
        else:
            raise ValueError(f"Unrecognized generator key {key!r}")
    return {"params": params}


def convert_discriminator_state(state: Mapping[str, np.ndarray]) -> Dict:
    """Reference NLayerDiscriminatorv2 state dict -> flax params for
    nn.discriminator.NLayerDiscriminatorv2.

    torch layout: block_in.0 (conv), blocks.{i}.0 (conv) / blocks.{i}.2
    (GroupNorm), to_logits.0 (1x1 conv) / to_logits.2 (5x5 conv);
    BlurBlock kernels are fixed buffers (skipped)."""
    params: Dict = {}

    def put(path_str: str, value: np.ndarray):
        _set_path(params, tuple(path_str.split("/")), value)

    for key, value in state.items():
        if key.endswith(_SKIP_SUFFIXES) or ".kernel" in key:
            continue  # BlurBlock buffer
        value = _to_numpy(value)
        parts = key.split(".")
        leaf = "kernel" if parts[-1] == "weight" else parts[-1]
        if value.ndim == 4:
            value = value.transpose(2, 3, 1, 0)
        if key.startswith("block_in.0."):
            put(f"block_in_conv/{leaf}", value)
        elif key.startswith("blocks."):
            i, sub = parts[1], parts[2]
            if sub == "0":
                put(f"block_{i}_conv/{leaf}", value)
            elif sub == "2":
                name = "scale" if parts[-1] == "weight" else "bias"
                put(f"block_{i}_norm/{name}", value)
            else:
                raise ValueError(f"Unrecognized discriminator key {key!r}")
        elif key.startswith("to_logits.0."):
            put(f"to_logits_conv1/{leaf}", value)
        elif key.startswith("to_logits.2."):
            put(f"to_logits_conv2/{leaf}", value)
        else:
            raise ValueError(f"Unrecognized discriminator key {key!r}")
    return {"params": params}


def convert_original_discriminator_state(
    state: Mapping[str, np.ndarray], num_stages: int = 3
) -> Dict:
    """Reference OriginalNLayerDiscriminator (Pix2Pix) state dict -> flax
    params for nn.discriminator.OriginalNLayerDiscriminator.

    torch Sequential layout: [Conv, LReLU] + per-stage [Conv, BN, LReLU]
    (stages 1..num_stages-1 strided, then one stride-1 stage) + [Conv out].
    """
    params: Dict = {}
    batch_stats: Dict = {}

    def put(tree, path_str: str, value: np.ndarray):
        _set_path(tree, tuple(path_str.split("/")), value)

    # sequential index -> (kind, name)
    layout = {0: ("conv", "conv_0")}
    idx = 2
    for n in range(1, num_stages + 1):
        layout[idx] = ("conv", f"conv_{n}")
        layout[idx + 1] = ("bn", f"bn_{n}")
        idx += 3
    layout[idx] = ("conv", "conv_out")

    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = _to_numpy(value)
        parts = key.split(".")
        assert parts[0] == "main", f"Unrecognized discriminator key {key!r}"
        kind, name = layout[int(parts[1])]
        leaf = parts[2]
        if kind == "conv":
            if leaf == "weight":
                put(params, f"{name}/kernel", value.transpose(2, 3, 1, 0))
            else:
                put(params, f"{name}/bias", value)
        else:  # batchnorm
            if leaf == "weight":
                put(params, f"{name}/scale", value)
            elif leaf == "bias":
                put(params, f"{name}/bias", value)
            elif leaf == "running_mean":
                put(batch_stats, f"{name}/mean", value)
            elif leaf == "running_var":
                put(batch_stats, f"{name}/var", value)
    return {"params": params, "batch_stats": batch_stats}


def load_tokenizer_params(path: str) -> Dict:
    return convert_tokenizer_state(load_torch_state_dict(path))


def load_generator_params(path: str) -> Dict:
    return convert_generator_state(load_torch_state_dict(path))
