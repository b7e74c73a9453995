from maskbit_tpu.models.generator import Bert, LFQBert, make_generator
from maskbit_tpu.models.taming import OriginalVQModel
from maskbit_tpu.models.tokenizer import ConvVQModel

__all__ = ["Bert", "LFQBert", "make_generator", "OriginalVQModel", "ConvVQModel"]
