from maskbit_tpu.core.config import Config, config_from_cli, load_config

__all__ = ["Config", "load_config", "config_from_cli"]
