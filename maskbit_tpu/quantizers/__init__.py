from maskbit_tpu.quantizers.lfq import LookupFreeQuantizer
from maskbit_tpu.quantizers.vq import SimpleVectorizer

__all__ = ["LookupFreeQuantizer", "SimpleVectorizer"]
