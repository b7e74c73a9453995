from maskbit_tpu.train.generator_trainer import (
    GeneratorTrainState,
    init_generator_train_state,
    make_generator_train_step,
    make_generator_train_step_from_tokens,
)
from maskbit_tpu.train.tokenizer_trainer import (
    TokenizerTrainState,
    init_tokenizer_train_state,
    make_optimizer,
    make_tokenizer_train_step,
)

__all__ = [
    "GeneratorTrainState", "init_generator_train_state",
    "make_generator_train_step", "make_generator_train_step_from_tokens",
    "TokenizerTrainState", "init_tokenizer_train_state",
    "make_optimizer", "make_tokenizer_train_step",
]
