"""Reverse converter: flax params -> reference `pytorch_model.bin`.

Round-trip proof: reference state dict -> convert_*_state -> export_*_state
must reproduce the ORIGINAL state dict bit-exactly — key set (including the
registered buffers the import path drops and the export reconstructs),
values, and dtypes. That is exactly the strict_loading=True contract of
the reference's load_pretrained (modeling/modules/base_model.py:87-133),
which the end-to-end test below also exercises for real.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from maskbit_tpu.compat.torch_convert import (  # noqa: E402
    convert_generator_state,
    convert_tokenizer_state,
)
from maskbit_tpu.compat.torch_export import (  # noqa: E402
    export_generator_state,
    export_tokenizer_state,
    save_torch_state_dict,
)
from reference_compat import import_reference, torch_state_numpy  # noqa: E402
from test_parity_generator import SMALL as GEN_SMALL  # noqa: E402
from test_parity_tokenizer import SMALL as TOK_SMALL, build_reference  # noqa: E402

import_reference()


def _assert_state_equal(exported, original):
    assert set(exported) == set(original), (
        f"missing={sorted(set(original) - set(exported))} "
        f"extra={sorted(set(exported) - set(original))}"
    )
    for key in original:
        got = np.asarray(exported[key])
        want = np.asarray(original[key])
        assert got.dtype == want.dtype, (key, got.dtype, want.dtype)
        np.testing.assert_array_equal(got, want, err_msg=key)


def test_tokenizer_export_round_trip_lfq():
    torch.manual_seed(0)
    original = torch_state_numpy(build_reference(TOK_SMALL))
    variables = convert_tokenizer_state(original)
    exported = export_tokenizer_state(
        variables, codebook_size=TOK_SMALL["codebook_size"])
    _assert_state_equal(exported, original)


def test_tokenizer_export_round_trip_vq():
    cfg = dict(TOK_SMALL, quantizer_type="lookup", token_size=16, codebook_size=128)
    torch.manual_seed(1)
    original = torch_state_numpy(build_reference(cfg))
    variables = convert_tokenizer_state(original)
    exported = export_tokenizer_state(variables)  # codebook rides as a param
    _assert_state_equal(exported, original)


def test_tokenizer_export_lfq_requires_codebook_size():
    torch.manual_seed(0)
    variables = convert_tokenizer_state(torch_state_numpy(build_reference(TOK_SMALL)))
    with pytest.raises(ValueError, match="codebook_size"):
        export_tokenizer_state(variables)


@pytest.mark.parametrize("model_name", ["lfq_bert", "bert"])
@pytest.mark.parametrize("use_prenorm", [False, True])
def test_generator_export_round_trip(model_name, use_prenorm):
    from modeling.bert import Bert as RefBert
    from modeling.bert import LFQBert as RefLFQBert

    torch.manual_seed(2)
    ref_cls = RefLFQBert if model_name == "lfq_bert" else RefBert
    original = torch_state_numpy(ref_cls(**GEN_SMALL, use_prenorm=use_prenorm))
    variables = convert_generator_state(original)
    exported = export_generator_state(variables)
    _assert_state_equal(exported, original)


def test_convert_checkpoint_cli_round_trip(tmp_path):
    """bin -> msgpack -> bin through the CLI reproduces the reference
    state dict bit-exactly (direction inferred from extensions)."""
    from maskbit_tpu.cli.convert_checkpoint import main

    torch.manual_seed(5)
    original = torch_state_numpy(build_reference(TOK_SMALL))
    src = str(tmp_path / "ref.bin")
    mid = str(tmp_path / "zoo.msgpack")
    dst = str(tmp_path / "exported.bin")
    torch.save({k: torch.from_numpy(v) for k, v in original.items()}, src)

    main(["--input", src, "--output", mid])
    main(["--input", mid, "--output", dst,
          "--codebook-size", str(TOK_SMALL["codebook_size"])])

    exported = {k: v.numpy() for k, v in
                torch.load(dst, map_location="cpu", weights_only=True).items()}
    _assert_state_equal(exported, original)


def test_generator_export_bin_strict_loads_in_reference(tmp_path):
    """The full user journey: save_torch_state_dict writes a .bin a FRESH
    reference LFQBert loads with load_state_dict(strict=True), and the
    loaded model forwards identically to the source of the weights."""
    from modeling.bert import LFQBert as RefLFQBert

    torch.manual_seed(3)
    source = RefLFQBert(**GEN_SMALL)
    source.eval()
    variables = convert_generator_state(torch_state_numpy(source))

    path = str(tmp_path / "pytorch_model.bin")
    save_torch_state_dict(export_generator_state(variables), path)

    torch.manual_seed(4)  # different init — every weight must come from the file
    fresh = RefLFQBert(**GEN_SMALL)
    fresh.load_state_dict(torch.load(path, map_location="cpu"), strict=True)
    fresh.eval()

    rng = np.random.default_rng(0)
    seq_len = (GEN_SMALL["img_size"] // GEN_SMALL["input_stride"]) ** 2
    splits = GEN_SMALL["codebook_splits"]
    ecs = int(2 ** (np.log2(GEN_SMALL["codebook_size"]) // splits))
    tokens = torch.from_numpy(rng.integers(0, ecs, size=(2, seq_len, splits)))
    labels = torch.from_numpy(rng.integers(0, GEN_SMALL["nclass"], size=(2,)))
    with torch.no_grad():
        np.testing.assert_array_equal(
            source(tokens, labels).numpy(), fresh(tokens, labels).numpy())
