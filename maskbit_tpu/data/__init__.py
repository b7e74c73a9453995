from maskbit_tpu.data.shard_writer import ShardWriter, create_sharded_dataset
from maskbit_tpu.data.tar_reader import (
    SimpleImagenet,
    TarImageDataset,
    batched,
    expand_shard_pattern,
)
from maskbit_tpu.data.token_shards import TokenShardDataset, TokenShardWriter
from maskbit_tpu.data.transforms import EvalTransform, TrainTransform

__all__ = [
    "SimpleImagenet", "TarImageDataset", "batched", "expand_shard_pattern",
    "ShardWriter", "create_sharded_dataset",
    "TokenShardDataset", "TokenShardWriter",
    "TrainTransform", "EvalTransform",
]
