"""Rank-tier id wire format (config id_wire="ranktier"): the per-window
dictionary + tier-selector encoding is pure plumbing — decoded slot ids must
be bit-identical to what the planner produced, so training losses must match
the escape and plain formats exactly through learning, freeze, and churn."""

import numpy as np
import pytest

from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer


def _cfg(tables, **kw):
    return DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=256,
        learning_rate=0.5,
        cache=CacheConfig(
            cache_ratio=0.3, warmup_ratio=0.7, buffer_size=0,
            **{"prefetch_num": 2, "planner": "host"}, **kw,
        ),
    )


def _losses(tables, iters, seed, **cache_kw):
    cfg = _cfg(tables, **cache_kw)
    data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=iters,
        dense_in_features=4, seed=seed,
    )
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    report = trainer.train(data, num_iters=iters)
    return trainer, np.asarray(report.losses)


# 64 iters = 32 two-batch windows: 12 cold-skip + 12 learning, freeze at
# window 24, so >= 8 frozen rank-tier windows run with steady churn.
ITERS = 64


@pytest.mark.parametrize("tables", [
    [9000, 700, 40],          # mixed widths incl. a tiny always-plain table
    [30_000, 30_000],         # both cached (dict path)
])
def test_ranktier_matches_escape_and_plain(tables):
    t_rt, rt = _losses(tables, ITERS, seed=5, id_wire="ranktier")
    _, esc = _losses(tables, ITERS, seed=5, id_wire="escape")
    _, plain = _losses(tables, ITERS, seed=5, id_wire="plain")
    assert np.isfinite(rt).all()
    np.testing.assert_array_equal(rt, esc)
    np.testing.assert_array_equal(rt, plain)
    # the spec must actually freeze with at least one tiered feature —
    # otherwise this test silently degrades to plain-vs-plain
    assert t_rt._rt_spec not in (None, False)
    assert any(e[0] == "t" for e in t_rt._rt_spec)


def test_ranktier_mixed_kernel_resident_split():
    """Resident features tier on local ids (no dict), cached ones on dict
    ranks, tiny ones stay plain — all in one window format."""
    tables = [50_000, 3_000, 60, 40_000]
    kw = dict(id_wire="ranktier", resident_threshold=5_000)
    t_rt, rt = _losses(tables, ITERS, seed=9, **kw)
    _, esc = _losses(tables, ITERS, seed=9,
                     id_wire="escape", resident_threshold=5_000)
    np.testing.assert_array_equal(rt, esc)
    spec = t_rt._rt_spec
    assert spec not in (None, False)
    kinds = {f: e[0] for f, e in enumerate(spec)}
    dicts = {f: (e[4] if e[0] == "t" else 0) for f, e in enumerate(spec)}
    # cached features (0, 3) that tiered must carry a dict; resident tiered
    # features must not
    for f in (1, 2):
        assert dicts[f] == 0
    for f in (0, 3):
        if kinds[f] == "t":
            assert dicts[f] > 0


def test_ranktier_cap_overflow_falls_back_to_plain():
    """A window whose tier counts blow the frozen caps must ship the plain
    format (same bytes the learning windows shipped) and still decode
    correctly — simulated by freezing a spec with absurdly tight caps."""
    tables = [9000, 700]
    cfg = _cfg(tables, id_wire="ranktier")
    data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=50, dense_in_features=4, seed=3
    )
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    trainer.train(data, num_iters=50)  # past freeze
    spec = trainer._rt_spec
    assert spec not in (None, False)
    # squeeze every tier share to ~0 => caps ~64 => guaranteed overflow
    tight = tuple(
        ("t", e[1], e[2], (0.0, 0.0, 0.0, 0.0), e[4]) if e[0] == "t" else e
        for e in spec
    )
    trainer._rt_spec = tight
    data2 = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=8, dense_in_features=4, seed=4
    )
    report = trainer.train(data2, num_iters=8)
    assert np.isfinite(np.asarray(report.losses)).all()


def test_rank_sym_roundtrip():
    """_rt_rank_sym: rank 0 is the most frequent value; dict maps ranks back
    to values; out-of-dict symbols are -1."""
    vals = np.array([7, 7, 7, 3, 3, 99, 5], np.int32)
    sym, dv = CachedDLRMTrainer._rt_rank_sym(vals, dict_k=4)
    assert dv[0] == 7 and set(dv[:3]) == {7, 3} | {dv[2]}
    assert (sym >= -1).all() and (sym < 3).all()
    recon = np.where(sym >= 0, dv[np.clip(sym, 0, 3)], vals)
    np.testing.assert_array_equal(recon, vals)


def test_native_encoder_decode_parity_and_fallbacks():
    """The C++ steady-state encoder (hostops.RankTierEncoder) must produce a
    byte stream that DECODES to the exact slot ids — including across stale
    dictionaries (ranks rebuilt only every _RT_REBUILD windows), plain-entry
    escapes, and the numpy encoder's layout/size contract. Dict rank
    tie-breaks may differ from numpy, so parity is checked at decode level."""
    from cachedembedding_tpu._native import hostops
    from cachedembedding_tpu.train.trainer import _decode_window_ids
    import jax.numpy as jnp

    if not hostops.native_available():
        pytest.skip("libhostops.so not built")

    P, F, Bf = 4, 3, 256
    L = F * Bf
    n = P * Bf
    rng = np.random.default_rng(7)

    class Shim:
        pass

    s = Shim()
    for name in (
        "_RT_WIDTHS", "_RT_SKIP_WINDOWS", "_RT_LEARN_WINDOWS",
        "_RT_CAP_MARGIN", "_RT_T3_MARGIN", "_RT_FALLBACK_RESET",
        "_RT_DICT_W", "_RT_REBUILD", "_ESC_MAX_RATE", "_ESC_BITS",
    ):
        setattr(s, name, getattr(CachedDLRMTrainer, name))
    s._rt_stats, s._rt_seen, s._rt_spec, s._rt_ne = None, 0, None, 0
    s._rt_skip = 10**9  # learn immediately
    s._rt_caps_cache, s._rt_encoders, s._rt_enc_windows = {}, {}, 0
    s.embed = object()  # no _is_res_table, not a CachedEmbeddingBag
    s._rt_dict_features = lambda F: [True] * F
    s._rt_rank_sym = CachedDLRMTrainer._rt_rank_sym
    s._tier_learn = CachedDLRMTrainer._tier_learn.__get__(s)
    s._tier_freeze = CachedDLRMTrainer._tier_freeze.__get__(s)
    s._tier_encode = CachedDLRMTrainer._tier_encode.__get__(s)
    s._tier_encode_native = CachedDLRMTrainer._tier_encode_native.__get__(s)
    s._rt_cap = CachedDLRMTrainer._rt_cap
    s._device_rows = lambda: 9000

    def window():
        return (rng.zipf(1.3, size=(P, F, Bf)) - 1).clip(0, 8999).astype(np.int32)

    spec = [(16, 0)] * F
    for _ in range(s._RT_LEARN_WINDOWS - s._RT_SKIP_WINDOWS):
        s._tier_learn(window(), spec, P, Bf)
    assert s._rt_spec, "no spec frozen"

    # several windows: exercises fresh-dict, stale-dict and rebuild windows
    for i in range(2 * s._RT_REBUILD + 3):
        vals = window()
        out, layout, nb = s._tier_encode(vals, spec, P, L, Bf)
        assert isinstance(layout, tuple)
        dec, end = _decode_window_ids(
            jnp.asarray(out), (P, L, 0, 0, 0, layout)
        )
        np.testing.assert_array_equal(
            np.asarray(dec), vals.reshape(P, L),
            err_msg=f"window {i} (layout {layout[0] if layout else '?'})",
        )
        if layout[0] == "rt":
            assert end == nb
    assert s._rt_encoders, "native encoder was never engaged"

    # layout + size parity vs the numpy encoder on the same window
    vals = window()
    out_n, lay_n, nb_n = s._tier_encode(vals, spec, P, L, Bf)
    orig = hostops.make_ranktier_encoder
    hostops.make_ranktier_encoder = lambda *a, **k: None
    try:
        s._rt_encoders = {}
        out_p, lay_p, nb_p = s._tier_encode(vals, spec, P, L, Bf)
    finally:
        hostops.make_ranktier_encoder = orig
    assert lay_n == lay_p and nb_n == nb_p
    dec_p, _ = _decode_window_ids(jnp.asarray(out_p), (P, L, 0, 0, 0, lay_p))
    np.testing.assert_array_equal(np.asarray(dec_p), vals.reshape(P, L))
