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


def test_pack_ids_any_roundtrip():
    """Host nibble-pack <-> device unpack at every supported width."""
    import numpy as np
    import jax.numpy as jnp

    from cachedembedding_tpu._native import hostops
    from cachedembedding_tpu.train.trainer import _unpack_flat

    rng = np.random.default_rng(3)
    for w in (4, 8, 12, 16, 20, 24, 28, 32):
        hi = min(1 << w, 1 << 31)
        n = 512
        ids = rng.integers(0, hi, n).astype(np.int32)
        packed = hostops.pack_ids_any(ids, w)
        assert packed.nbytes == hostops.pf_nbytes(n, w), w
        got = np.asarray(_unpack_flat(jnp.asarray(packed), n, w))
        np.testing.assert_array_equal(got, ids, err_msg=f"width {w}")


def test_nibble_width_selection():
    from cachedembedding_tpu._native import hostops

    assert hostops.nibble_width(16, 100) == 4
    assert hostops.nibble_width(17, 100) == 8  # 5 bits -> 8 (odd-nibble needs pairs? no: 8 aligned)
    assert hostops.nibble_width(1 << 12, 100) == 12
    assert hostops.nibble_width((1 << 12) + 1, 101) == 16  # odd count: bump pair width
    assert hostops.nibble_width(1 << 20, 100) == 20
    assert hostops.nibble_width(1 << 28, 100) == 28
    assert hostops.nibble_width(1 << 30, 100) == 32
