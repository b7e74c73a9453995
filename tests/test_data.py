"""Data pipeline tests: shard writer -> tar reader round trip, transforms."""

import itertools
import io

import numpy as np
import pytest
from PIL import Image

from maskbit_tpu.data.shard_writer import ShardWriter, create_sharded_dataset
from maskbit_tpu.data.tar_reader import (
    SimpleImagenet,
    TarImageDataset,
    batched,
    expand_shard_pattern,
    iterate_tar_samples,
)
from maskbit_tpu.data.transforms import EvalTransform, TrainTransform


def _jpg_bytes(rng, size=(64, 48), color=None):
    arr = rng.integers(0, 255, size=size + (3,), dtype=np.uint8)
    if color is not None:
        arr[..., :] = color
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture
def shard_dir(tmp_path, rng):
    pattern = str(tmp_path / "test-%04d.tar")
    writer = ShardWriter(pattern, maxcount=10)
    for i in range(25):
        writer.write(f"{i:06d}", _jpg_bytes(rng), class_id=i % 5)
    writer.close()
    return tmp_path


def test_expand_shard_pattern():
    shards = expand_shard_pattern("/x/imagenet-train-{0000..0252}.tar")
    assert len(shards) == 253
    assert shards[0].endswith("imagenet-train-0000.tar")
    assert shards[-1].endswith("imagenet-train-0252.tar")
    assert expand_shard_pattern(["/a.tar", "/b.tar"]) == ["/a.tar", "/b.tar"]


def test_shard_round_trip(shard_dir):
    shards = expand_shard_pattern(str(shard_dir / "test-{0000..0002}.tar"))
    samples = []
    for shard in shards:
        samples.extend(iterate_tar_samples(shard))
    assert len(samples) == 25
    keys = sorted(s["__key__"].decode() for s in samples)
    assert keys == [f"{i:06d}" for i in range(25)]
    assert all("jpg" in s and "cls" in s for s in samples)


def test_eval_dataset_sequential(shard_dir):
    ds = TarImageDataset(
        str(shard_dir / "test-{0000..0002}.tar"),
        EvalTransform(resolution=32),
        resample=False,
        num_decode_threads=2,
    )
    items = list(ds)
    assert len(items) == 25
    img, label = items[0]
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert 0 <= label < 5


def test_train_dataset_resamples_forever(shard_dir):
    ds = TarImageDataset(
        str(shard_dir / "test-{0000..0002}.tar"),
        TrainTransform(resolution=32, seed=0),
        resample=True,
        shuffle_buffer_size=8,
        num_decode_threads=1,
    )
    it = iter(ds)
    batch = [next(it) for _ in range(60)]  # more than dataset size: resampling works
    assert len(batch) == 60
    assert batch[0][0].shape == (32, 32, 3)


def test_process_sharding(shard_dir):
    shards = str(shard_dir / "test-{0000..0002}.tar")
    counts = []
    for rank in range(2):
        ds = TarImageDataset(
            shards, EvalTransform(resolution=16), resample=False,
            process_index=rank, process_count=2, num_decode_threads=1,
        )
        counts.append(len(list(ds)))
    assert sum(counts) == 25
    assert all(c > 0 for c in counts)


def test_batched_collation(shard_dir):
    ds = TarImageDataset(
        str(shard_dir / "test-{0000..0002}.tar"), EvalTransform(resolution=16),
        resample=False, num_decode_threads=1,
    )
    batches = list(batched(iter(ds), 8, drop_last=False))
    assert batches[0]["image"].shape == (8, 16, 16, 3)
    assert batches[0]["class_id"].dtype == np.int32
    assert sum(b["image"].shape[0] for b in batches) == 25


def test_simple_imagenet_facade(shard_dir):
    data = SimpleImagenet(
        str(shard_dir / "test-{0000..0002}.tar"),
        str(shard_dir / "test-{0000..0002}.tar"),
        num_train_examples=25,
        per_device_batch_size=4,
        global_batch_size=4,
        num_workers_per_device=1,
        resolution=16,
        process_index=0,
        process_count=1,
    )
    assert data.num_batches == 7  # ceil(25/4)
    assert data.num_samples == 28
    it = iter(data.train_dataloader)
    batch = next(it)
    assert batch["image"].shape == (4, 16, 16, 3)
    eval_batches = list(data.eval_dataloader)
    assert sum(b["image"].shape[0] for b in eval_batches) == 25


def test_create_sharded_dataset(tmp_path, rng):
    for synset, n in (("n01", 3), ("n02", 4)):
        d = tmp_path / "imagenet" / synset
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            ).save(d / f"img_{i}.JPEG".lower())
    total = create_sharded_dataset(
        str(tmp_path / "imagenet"), str(tmp_path / "shards" / "out-%04d.tar"), maxcount=4
    )
    assert total == 7
    shards = expand_shard_pattern(str(tmp_path / "shards" / "out-{0000..0001}.tar"))
    samples = [s for sh in shards for s in iterate_tar_samples(sh)]
    assert len(samples) == 7
    labels = sorted(int(s["cls"]) for s in samples)
    assert labels == [0, 0, 0, 1, 1, 1, 1]


def test_process_decode_backend_matches_thread(shard_dir):
    """The multiprocessing decode pool (ROADMAP #6: GIL escape hatch for wide
    pod hosts) yields the same samples as the thread pool through the same
    iterator API (eval path is deterministic: no augmentation rng)."""
    kwargs = dict(resample=False, num_decode_threads=2)
    ds_thread = TarImageDataset(
        str(shard_dir / "test-{0000..0002}.tar"), EvalTransform(resolution=32),
        decode_backend="thread", **kwargs,
    )
    ds_proc = TarImageDataset(
        str(shard_dir / "test-{0000..0002}.tar"), EvalTransform(resolution=32),
        decode_backend="process", **kwargs,
    )
    a, b = list(ds_thread), list(ds_proc)
    assert len(a) == len(b) == 25
    for (img_a, lab_a), (img_b, lab_b) in zip(a, b):
        assert lab_a == lab_b
        np.testing.assert_array_equal(img_a, img_b)


def test_process_decode_backend_train_path(shard_dir):
    """Process backend works with the augmenting train transform and respects
    the shuffle-buffer iterator contract."""
    from maskbit_tpu.data.transforms import TrainTransform

    ds = TarImageDataset(
        str(shard_dir / "test-{0000..0002}.tar"),
        TrainTransform(resolution=32, seed=0),
        resample=True, shuffle_buffer_size=8, num_decode_threads=2,
        decode_backend="process",
    )
    items = list(itertools.islice(iter(ds), 30))
    assert len(items) == 30
    for img, label in items:
        assert img.shape == (32, 32, 3) and img.dtype == np.float32
        assert 0 <= label < 5


def test_train_decode_deterministic_across_backends(shard_dir):
    """Determinism contract (SURVEY §5): with a fixed seed the AUGMENTED
    train stream is bit-identical across the serial/thread/process decode
    backends AND across repeated runs — augmentation rng is a pure function
    of (seed, process, sample index), not of worker identity (the round-2
    process pool seeded by os.getpid() broke this run-to-run)."""
    from maskbit_tpu.data.transforms import TrainTransform

    def stream(backend, threads):
        ds = TarImageDataset(
            str(shard_dir / "test-{0000..0002}.tar"),
            TrainTransform(resolution=32, seed=7),
            resample=True, shuffle_buffer_size=8, seed=3,
            num_decode_threads=threads, decode_backend=backend,
        )
        return list(itertools.islice(iter(ds), 30))

    ref = stream("thread", 1)  # serial path
    for variant in (stream("thread", 3), stream("process", 2), stream("thread", 1)):
        assert len(variant) == len(ref)
        for (img_a, lab_a), (img_b, lab_b) in zip(ref, variant):
            assert lab_a == lab_b
            np.testing.assert_array_equal(img_a, img_b)


def test_decode_backend_validation(shard_dir):
    with pytest.raises(ValueError):
        TarImageDataset(
            str(shard_dir / "test-0000.tar"), EvalTransform(resolution=32),
            decode_backend="bogus",
        )
