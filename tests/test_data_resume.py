"""Data-loader resume tests: fast_forward must land exactly where sequential
consumption would (same seeded shuffle, no payload reads), for the Python
reader, the weighted mixture, and the native C++ reader's skip_batches."""
import numpy as np
import pytest

from lit_llama_ja_tpu.data.packed_dataset import (
    CombinedDataset,
    PackedDataset,
    PackedDatasetBuilder,
)


def make_files(tmp_path, prefix="res", n_files=4, chunk_size=64, vocab=500):
    b = PackedDatasetBuilder(
        outdir=str(tmp_path), prefix=prefix, chunk_size=chunk_size,
        sep_token=0, dtype="auto", vocab_size=vocab,
    )
    rng = np.random.default_rng(hash(prefix) % 2**31)
    for _ in range(n_files):
        b.add_array(rng.integers(1, vocab, size=(chunk_size,)).astype(np.uint16))
    b.write_reminder()
    return b.filenames


@pytest.mark.parametrize("skip", [0, 3, 7, 19])
def test_packed_fast_forward_matches_sequential(tmp_path, skip):
    files = make_files(tmp_path)
    kw = dict(n_chunks=2, block_size=16, seed=99, shuffle=True, wrap=True)
    ref = iter(PackedDataset(files, **kw))
    for _ in range(skip):
        next(ref)
    want = [np.asarray(next(ref)) for _ in range(5)]

    resumed = iter(PackedDataset(files, **kw))
    resumed.fast_forward(skip)
    assert resumed.state_dict()["n_yielded"] == skip
    got = [np.asarray(next(resumed)) for _ in range(5)]
    np.testing.assert_array_equal(np.stack(got), np.stack(want))


def test_packed_fast_forward_across_chunk_windows(tmp_path):
    """Skip past a window reload boundary (n_chunks files re-mmap + reshuffle)."""
    files = make_files(tmp_path, n_files=4, chunk_size=32)
    kw = dict(n_chunks=2, block_size=16, seed=5, shuffle=True, wrap=True)
    ref = iter(PackedDataset(files, **kw))
    skip = 9  # window holds 2*32/16 = 4 blocks -> crosses 2 reloads
    for _ in range(skip):
        next(ref)
    want = np.asarray(next(ref))
    resumed = iter(PackedDataset(files, **kw))
    resumed.fast_forward(skip)
    np.testing.assert_array_equal(np.asarray(next(resumed)), want)


def test_combined_fast_forward_matches_sequential(tmp_path):
    files_a = make_files(tmp_path, prefix="a", n_files=3)
    files_b = make_files(tmp_path, prefix="b", n_files=3)

    def mk():
        dss = [
            PackedDataset(f, n_chunks=1, block_size=16, seed=7, wrap=True)
            for f in (files_a, files_b)
        ]
        return CombinedDataset(dss, seed=11, weights=[0.7, 0.3])

    ref = iter(mk())
    skip = 13
    for _ in range(skip):
        next(ref)
    want = [np.asarray(next(ref)) for _ in range(4)]
    resumed = iter(mk())
    resumed.fast_forward(skip)
    assert resumed.state_dict()["n_yielded"] == skip
    got = [np.asarray(next(resumed)) for _ in range(4)]
    np.testing.assert_array_equal(np.stack(got), np.stack(want))


def test_native_skip_batches_matches_drain(tmp_path):
    native = pytest.importorskip("lit_llama_ja_tpu.data.native_loader")
    if not native.native_available():
        pytest.skip("g++ build failed")
    files = make_files(tmp_path, n_files=4, chunk_size=64)
    kw = dict(batch_size=2, block_size=16, seed=3, shuffle=True, wrap=True)
    ref = native.NativePackedBatches(files, **kw)
    skip = 5
    for _ in range(skip):
        next(ref)
    want = [next(ref).copy() for _ in range(3)]
    ref.close()
    resumed = native.NativePackedBatches(files, skip_batches=skip, **kw)
    got = [next(resumed).copy() for _ in range(3)]
    resumed.close()
    np.testing.assert_array_equal(np.stack(got), np.stack(want))
