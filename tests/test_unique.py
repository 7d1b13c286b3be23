import numpy as np
import jax.numpy as jnp

from cachedembedding_tpu.ops.unique import unique_fixed


def test_unique_basic():
    ids = jnp.array([5, 5, 3, 9, 3, 3], jnp.int32)
    uids, counts, n = unique_fixed(ids, size=8)
    np.testing.assert_array_equal(np.asarray(uids)[:3], [3, 5, 9])
    np.testing.assert_array_equal(np.asarray(counts)[:3], [3, 2, 1])
    assert np.all(np.asarray(uids)[3:] == -1)
    assert np.all(np.asarray(counts)[3:] == 0)
    assert int(n) == 3


def test_unique_overflow_detected():
    ids = jnp.arange(10, dtype=jnp.int32)
    uids, counts, n = unique_fixed(ids, size=4)
    assert int(n) == 10  # true count reported even though table truncated
    np.testing.assert_array_equal(np.asarray(uids), [0, 1, 2, 3])


def test_unique_random_matches_numpy():
    rng = np.random.default_rng(0)
    for L in [1, 7, 1000]:
        ids = rng.integers(0, 50, size=L).astype(np.int32)
        ref_u, ref_c = np.unique(ids, return_counts=True)
        uids, counts, n = unique_fixed(jnp.asarray(ids), size=L)
        assert int(n) == ref_u.size
        np.testing.assert_array_equal(np.asarray(uids)[: ref_u.size], ref_u)
        np.testing.assert_array_equal(np.asarray(counts)[: ref_u.size], ref_c)
