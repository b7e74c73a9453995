import textwrap

import pytest

from maskbit_tpu.core.config import Config, load_config


@pytest.fixture
def yaml_file(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(
        textwrap.dedent(
            """
            experiment:
                name: "demo"
                max_train_examples: 1_281_167
            model:
                vq_model:
                    token_size: 12
                    channel_mult: [1, 1, 2, 2, 4]
            optimizer:
                params:
                    learning_rate: 1e-4
            lr_scheduler:
                params:
                    learning_rate: ${optimizer.params.learning_rate}
            """
        )
    )
    return str(path)


def test_attribute_access(yaml_file):
    cfg = load_config(yaml_file)
    assert cfg.experiment.name == "demo"
    assert cfg.model.vq_model.token_size == 12
    assert list(cfg.model.vq_model.channel_mult) == [1, 1, 2, 2, 4]


def test_interpolation(yaml_file):
    cfg = load_config(yaml_file)
    assert cfg.lr_scheduler.params.learning_rate == pytest.approx(1e-4)


def test_cli_overrides(yaml_file):
    cfg = load_config(
        yaml_file,
        overrides=[
            "model.vq_model.token_size=18",
            "experiment.name=other",
            "training.new_flag=true",
        ],
    )
    assert cfg.model.vq_model.token_size == 18
    assert cfg.experiment.name == "other"
    assert cfg.training.new_flag is True


def test_get_with_default(yaml_file):
    cfg = load_config(yaml_file)
    assert cfg.model.vq_model.get("num_res_blocks_decoder", 2) == 2
    assert cfg.model.vq_model.get("token_size", 0) == 12


def test_merge_and_dotted_select():
    cfg = Config({"a": {"b": 1}})
    merged = cfg.merge({"a": {"c": 2}})
    assert merged.a.b == 1 and merged.a.c == 2
    assert merged.select("a.c") == 2
    assert merged.select("a.missing", default=7) == 7


def test_validate_generator_config():
    from maskbit_tpu.cli.common import validate_generator_config

    def cfg(**over):
        tree = {
            "model": {
                "vq_model": {"codebook_size": 1024, "token_size": 10,
                             "quantizer_type": "lookup-free", "num_resolutions": 5},
                "mlm_model": {"codebook_splits": 2, "input_stride": 16, "img_size": 256},
            },
            "dataset": {"preprocessing": {"resolution": 256}},
        }
        for k, v in over.items():
            node = tree
            parts = k.split("__")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v
        return Config(tree)

    validate_generator_config(cfg())  # valid

    with pytest.raises(ValueError, match="power of two"):
        validate_generator_config(cfg(model__vq_model__codebook_size=1000))
    with pytest.raises(ValueError, match="token_size"):
        validate_generator_config(cfg(model__vq_model__token_size=12))
    with pytest.raises(ValueError, match="codebook_splits"):
        validate_generator_config(cfg(model__mlm_model__codebook_splits=3))
    with pytest.raises(ValueError, match="input_stride"):
        validate_generator_config(cfg(model__mlm_model__input_stride=8))
    with pytest.raises(ValueError, match="img_size"):
        validate_generator_config(cfg(model__mlm_model__img_size=512))


def test_legacy_reference_keys_alias(tmp_path):
    """Reference-repo YAMLs (per_gpu_batch_size, num_workers_per_gpu) load
    verbatim: the legacy names move onto the TPU names, an explicit new-name
    value wins, and legacy dotted CLI overrides are honored too."""
    path = tmp_path / "ref.yaml"
    path.write_text(textwrap.dedent(
        """
        training:
            per_gpu_batch_size: 48
            enable_tf32: True
        dataset:
            params:
                num_workers_per_gpu: 4
                pin_memory: True
        """
    ))
    cfg = load_config(str(path))
    assert cfg.training.per_device_batch_size == 48
    assert cfg.dataset.params.num_workers_per_device == 4
    assert "per_gpu_batch_size" not in cfg.training
    assert "num_workers_per_gpu" not in cfg.dataset.params

    # explicit new-style key wins over the legacy one
    cfg = load_config(str(path), overrides=["training.per_device_batch_size=8"])
    assert cfg.training.per_device_batch_size == 8

    # a legacy key given as a CLI override is normalized as well
    cfg = load_config(str(path), overrides=["training.per_gpu_batch_size=96"])
    assert cfg.training.per_device_batch_size == 96

    # ...and a legacy CLI override beats a new-style key in the YAML
    # (OmegaConf last-wins semantics)
    path2 = tmp_path / "new.yaml"
    path2.write_text("training:\n    per_device_batch_size: 32\n")
    cfg = load_config(str(path2), overrides=["training.per_gpu_batch_size=64"])
    assert cfg.training.per_device_batch_size == 64
