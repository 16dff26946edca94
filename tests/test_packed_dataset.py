"""Packed dataset tests (reference analogue: `tests/test_packed_dataset.py`)."""
import numpy as np
import pytest

from lit_llama_ja_tpu.data.packed_dataset import (
    HDR_MAGIC,
    CombinedDataset,
    PackedDataset,
    PackedDatasetBuilder,
    batch_iterator,
    read_header,
)


def build_files(tmp_path, n_files=4, chunk_size=16, vocab_size=100, prefix="ds"):
    builder = PackedDatasetBuilder(
        outdir=str(tmp_path), prefix=prefix, chunk_size=chunk_size,
        sep_token=0, dtype="auto", vocab_size=vocab_size,
    )
    all_tokens = []
    rng = np.random.default_rng(0)
    for _ in range(n_files):
        arr = rng.integers(1, vocab_size, size=(chunk_size,)).astype(np.uint16)
        builder.add_array(arr)
        all_tokens.append(arr)
    builder.write_reminder()
    return builder.filenames, np.concatenate(all_tokens)


def test_builder_header_and_dtype(tmp_path):
    files, _ = build_files(tmp_path)
    assert len(files) == 4
    with open(files[0], "rb") as f:
        assert f.read(7) == HDR_MAGIC
    dtype, chunk_size = read_header(files[0])
    assert dtype == np.uint16  # vocab < 65500 (reference packed_dataset.py:79-84)
    assert chunk_size == 16


def test_builder_int32_for_large_vocab(tmp_path):
    b = PackedDatasetBuilder(
        outdir=str(tmp_path), prefix="big", chunk_size=8, sep_token=0,
        dtype="auto", vocab_size=70000,
    )
    assert b.dtype == np.int32


def test_roundtrip_unshuffled(tmp_path):
    files, all_tokens = build_files(tmp_path, n_files=2, chunk_size=16)
    ds = PackedDataset(files, n_chunks=2, block_size=4, shuffle=False)
    blocks = list(ds)
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(got, all_tokens)


def test_roundtrip_shuffled_is_permutation(tmp_path):
    files, all_tokens = build_files(tmp_path, n_files=2, chunk_size=16)
    ds = PackedDataset(files, n_chunks=2, block_size=8, seed=7, shuffle=True)
    got = np.concatenate(list(ds))
    np.testing.assert_array_equal(np.sort(got), np.sort(all_tokens))


@pytest.mark.parametrize(
    "num_processes,num_workers", [(1, 1), (2, 1), (3, 1), (2, 2)]
)
def test_file_sharding_partition(tmp_path, num_processes, num_workers):
    """Shards must partition the usable files exactly, with no overlap
    (reference `tests/test_packed_dataset.py:172-203` behaviour)."""
    files, _ = build_files(tmp_path, n_files=7)
    assigned = []
    for rank in range(num_processes):
        for worker in range(num_workers):
            ds = PackedDataset(
                files, n_chunks=1, block_size=4,
                num_processes=num_processes, process_rank=rank,
                num_workers=num_workers, worker_id=worker,
            )
            assigned.append(ds.shard_filenames())
    flat = [f for shard in assigned for f in shard]
    assert len(flat) == len(set(flat))  # disjoint
    num_shards = num_processes * num_workers
    usable = len(files) // num_shards * num_shards
    assert len(flat) == usable
    sizes = {len(s) for s in assigned}
    assert len(sizes) == 1  # balanced


def test_wrap_repeats(tmp_path):
    files, _ = build_files(tmp_path, n_files=1, chunk_size=8)
    ds = PackedDataset(files, n_chunks=1, block_size=4, shuffle=False, wrap=True)
    it = iter(ds)
    blocks = [next(it) for _ in range(5)]  # more than available without wrap
    assert len(blocks) == 5


def test_combined_dataset_mixing(tmp_path):
    files_a, _ = build_files(tmp_path, n_files=2, prefix="a")
    files_b, _ = build_files(tmp_path, n_files=2, prefix="b")
    ds_a = PackedDataset(files_a, n_chunks=1, block_size=4, wrap=True)
    ds_b = PackedDataset(files_b, n_chunks=1, block_size=4, wrap=True)
    combined = CombinedDataset([ds_a, ds_b], seed=1, weights=[0.5, 0.5])
    it = iter(combined)
    samples = [next(it) for _ in range(10)]
    assert all(s.shape == (4,) for s in samples)


def test_batch_iterator(tmp_path):
    files, _ = build_files(tmp_path, n_files=2, chunk_size=16)
    ds = PackedDataset(files, n_chunks=2, block_size=4, shuffle=False)
    batches = list(batch_iterator(ds, batch_size=2))
    assert batches[0].shape == (2, 4)
