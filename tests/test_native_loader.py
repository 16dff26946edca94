"""Native C++ packed-reader tests: build, parity with the NumPy reader, prefetch."""
import numpy as np
import pytest

from lit_llama_ja_tpu.data.packed_dataset import PackedDataset, PackedDatasetBuilder

native = pytest.importorskip("lit_llama_ja_tpu.data.native_loader")


@pytest.fixture(scope="module")
def built():
    if not native.native_available():
        pytest.skip("g++ build failed")
    return True


def make_files(tmp_path, n_files=3, chunk_size=32, vocab=100):
    b = PackedDatasetBuilder(
        outdir=str(tmp_path), prefix="nat", chunk_size=chunk_size,
        sep_token=0, dtype="auto", vocab_size=vocab,
    )
    rng = np.random.default_rng(7)
    toks = []
    for _ in range(n_files):
        arr = rng.integers(1, vocab, size=(chunk_size,)).astype(np.uint16)
        b.add_array(arr)
        toks.append(arr)
    b.write_reminder()
    return b.filenames, np.concatenate(toks)


def test_native_matches_python_unshuffled(built, tmp_path):
    files, all_tokens = make_files(tmp_path)
    it = native.NativePackedBatches(
        files, batch_size=1, block_size=8, shuffle=False
    )
    got = np.concatenate([next(it)[0] for _ in range(len(all_tokens) // 8)])
    np.testing.assert_array_equal(got, all_tokens.astype(np.int32))
    it.close()


def test_native_batched_shapes(built, tmp_path):
    files, _ = make_files(tmp_path, n_files=4)
    it = native.NativePackedBatches(files, batch_size=4, block_size=8, wrap=True)
    for _ in range(10):
        b = next(it)
        assert b.shape == (4, 8)
        assert b.dtype == np.int32
    it.close()


def test_native_shuffle_is_permutation(built, tmp_path):
    files, all_tokens = make_files(tmp_path, n_files=2)
    it = native.NativePackedBatches(
        files, batch_size=1, block_size=8, shuffle=True, seed=3
    )
    got = np.concatenate([next(it)[0] for _ in range(len(all_tokens) // 8)])
    assert not np.array_equal(got, all_tokens)  # actually shuffled
    np.testing.assert_array_equal(np.sort(got), np.sort(all_tokens))
    it.close()


def test_native_exhaustion_without_wrap(built, tmp_path):
    files, all_tokens = make_files(tmp_path, n_files=2)
    it = native.NativePackedBatches(files, batch_size=1, block_size=8, shuffle=False)
    n = 0
    with pytest.raises(StopIteration):
        while True:
            next(it)
            n += 1
    assert n == len(all_tokens) // 8
    it.close()


def test_native_rank_sharding(built, tmp_path):
    files, _ = make_files(tmp_path, n_files=4)
    seen = []
    for rank in range(2):
        it = native.NativePackedBatches(
            files, batch_size=1, block_size=8, shuffle=False,
            num_processes=2, process_rank=rank,
        )
        rows = []
        try:
            while True:
                rows.append(next(it)[0].copy())
        except StopIteration:
            pass
        seen.append(np.concatenate(rows))
        it.close()
    # the two ranks see disjoint halves that together cover everything
    py_rank0 = PackedDataset(files, 2, 8, shuffle=False,
                             num_processes=2, process_rank=0)
    want0 = np.concatenate(list(py_rank0))
    np.testing.assert_array_equal(seen[0], want0.astype(np.int32))
