"""Build flagship-scale torch .bin checkpoints from the reference modules.

VERDICT r1 item 6 (second half): the zoo-layout state dicts of the released
checkpoints (reference README.md:46-59), built from the reference's own
torch model classes with random weights, saved in the .bin format the
framework auto-converts on load (core/checkpoint.py:load_pretrained). Use to
drive cli/eval_maskbit end to end through the REAL converter path:

    python tools/make_flagship_bins.py /tmp/zoo
    PYTHONPATH=... python -m maskbit_tpu.cli.eval_maskbit \
        config=configs/generator/maskbit_generator_14bit.yaml \
        experiment.vqgan_checkpoint=/tmp/zoo/maskbit_tokenizer_14bit.bin \
        experiment.generator_checkpoint=/tmp/zoo/maskbit_generator_14bit.bin \
        eval.batch_size=8 eval.total_samples=8
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zoo"
    os.makedirs(out, exist_ok=True)

    import torch
    from reference_compat import AttrDict, import_reference

    import_reference()
    from modeling.bert import LFQBert as RefLFQBert
    from modeling.conv_vqgan import ConvVQModel as RefConvVQModel

    torch.manual_seed(0)
    tok = RefConvVQModel(AttrDict(dict(
        resolution=256, num_channels=3, hidden_channels=128,
        channel_mult=[1, 1, 2, 2, 4], num_resolutions=5, num_res_blocks=2,
        codebook_size=2**14, token_size=14, quantizer_type="lookup-free",
        commitment_cost=0.25, entropy_loss_weight=0.02,
        entropy_loss_temperature=0.01, entropy_gamma=1.0, sample_with_conv=True,
    )), legacy=False)
    gen = RefLFQBert(
        img_size=256, hidden_dim=1024, codebook_size=2**14, codebook_splits=2,
        depth=24, heads=16, mlp_dim=4096, dropout=0.1, nclass=1000,
        input_stride=16, use_prenorm=False,
    )
    tok_path = os.path.join(out, "maskbit_tokenizer_14bit.bin")
    gen_path = os.path.join(out, "maskbit_generator_14bit.bin")
    torch.save(tok.state_dict(), tok_path)
    torch.save(gen.state_dict(), gen_path)
    print(f"wrote {tok_path} ({os.path.getsize(tok_path)//2**20} MB), "
          f"{gen_path} ({os.path.getsize(gen_path)//2**20} MB)")


if __name__ == "__main__":
    main()
