from maskbit_tpu.sampling.sample import SamplingConfig, default_labels, make_sampler, sample_tokens

__all__ = ["SamplingConfig", "default_labels", "make_sampler", "sample_tokens"]
