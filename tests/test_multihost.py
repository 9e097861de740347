"""Multi-host shard arithmetic + per-process data slicing.

Real multi-process runs need a cluster this image does not provide; these
tests pin the logic (SURVEY.md §2.7: per-host data sharding +
`jax.distributed.initialize` entry) so the single-process path stays
untouched and the shard math is provably a partition of the reference's
global batch.
"""

import numpy as np
import pytest

from indm_tpu import parallel
from indm_tpu.data import EpochIterator


def test_host_local_slice_partitions_the_global_batch():
  for nproc in (1, 2, 4, 8):
    seen = []
    for pid in range(nproc):
      start, count = parallel.host_local_slice(128, nproc, pid)
      assert count == 128 // nproc
      seen.extend(range(start, start + count))
    assert sorted(seen) == list(range(128))


def test_host_local_slice_rejects_indivisible():
  with pytest.raises(ValueError, match="divide"):
    parallel.host_local_slice(100, 3, 0)


def test_host_local_slice_single_process_defaults():
  start, count = parallel.host_local_slice(64)
  assert (start, count) == (0, 64)


def test_epoch_iterator_shards_partition_each_global_batch():
  """Union over processes of the sharded iterators' first batch must be
  exactly the unsharded iterator's first batch, in order."""
  data = (np.arange(40)[:, None, None, None]
          * np.ones((1, 4, 4, 3))).astype(np.uint8)
  ref = EpochIterator(data, 16, shuffle=True, random_flip=False,
                      repeat=True, seed=7)
  global_batch = next(iter(ref))
  ref.close()

  parts = []
  for pid in range(4):
    it = EpochIterator(data, 16, shuffle=True, random_flip=False,
                       repeat=True, seed=7, shard=(pid, 4))
    b = next(iter(it))
    assert b.shape[0] == 4
    parts.append(b)
    it.close()
  np.testing.assert_array_equal(np.concatenate(parts), global_batch)


def test_epoch_iterator_shard_rejects_indivisible():
  data = np.zeros((8, 4, 4, 3), np.uint8)
  with pytest.raises(ValueError, match="divide"):
    EpochIterator(data, 10, shard=(0, 3))


def test_initialize_distributed_is_noop_without_coordinator(monkeypatch):
  for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES"):
    monkeypatch.delenv(var, raising=False)
  assert parallel.initialize_distributed() == 1
