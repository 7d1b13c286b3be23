"""Escape-coded id wire format (trainer._escape_encode): per-feature narrow
base widths learned from the live stream + window-level escape list. Must be
numerically invisible — same ids on device, so identical losses — and must
fall back to the plain format cleanly when the escape budget overflows."""

import numpy as np

from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

# A wide table (forces a 12-bit+ plain width) + small resident tables: the
# zipf stream's hot head makes the wide features' ids mostly tiny, which is
# exactly what the escape format exploits.
TABLES = [5000, 1200, 50, 20]


def _cfg(escape, **kw):
    return DLRMConfig(
        num_embeddings_per_feature=TABLES,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=128,
        learning_rate=0.5,
        cache=CacheConfig(
            cache_ratio=0.2, warmup_ratio=0.7, buffer_size=0,
            prefetch_num=2, use_lfu_eviction=True, use_freq=False,
            planner="host", resident_threshold=100, escape_pack=escape,
        ),
        **kw,
    )


def _data(cfg, n, seed=31):
    return SyntheticLongTailDataset(
        TABLES, cfg.batch_size, num_batches=n, dense_in_features=4, seed=seed,
        skew=0.6,
    )


def test_escape_pack_matches_plain():
    """Losses identical with escape_pack on vs off, across the learn->freeze
    transition (learn window shortened so the frozen format covers most of
    the run)."""
    losses = {}
    for esc in (False, True):
        cfg = _cfg(esc)
        trainer = CachedDLRMTrainer(cfg)
        trainer._esc_learn_windows = 3
        rep = trainer.train(_data(cfg, 16), num_iters=16)
        losses[esc] = rep.losses
        if esc:
            assert trainer._esc_spec is not None, "spec never learned"
            if trainer._esc_spec:  # narrowed (False = learned-off is legal)
                tag, spec, ne = trainer._esc_spec
                assert tag == "esc" and ne >= 512
                plain = trainer._esc_plain_spec
                assert any(w < pw for (w, _), (pw, _) in zip(spec, plain))
                # deltas preserved
                assert all(d == pd for (_, d), (_, pd) in zip(spec, plain))
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-6)


def test_escape_pack_all_cached_matches_plain():
    """resident_threshold=0 (all-cached bag): pf_pack_spec is None, so the
    trainer synthesizes a uniform per-feature spec from the device row count
    and the escape format still applies. Losses must match escape-off."""
    losses = {}
    for esc in (False, True):
        cfg = _cfg(esc)
        cfg.cache.resident_threshold = 0
        trainer = CachedDLRMTrainer(cfg)
        trainer._esc_learn_windows = 3
        rep = trainer.train(_data(cfg, 16), num_iters=16)
        losses[esc] = rep.losses
        if esc:
            assert trainer._esc_spec is not None, "spec never learned"
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-6)


def test_escape_encode_roundtrip_and_overflow():
    """Unit-level: _try_escape_encode + _decode_window_ids reproduce the ids
    exactly; an over-budget window returns None (plain fallback)."""
    import jax

    cfg = _cfg(True)
    trainer = CachedDLRMTrainer(cfg)
    P, F, Bf = 2, 4, 128
    L = F * Bf
    rng = np.random.default_rng(0)
    # plain spec from the bag, mirroring _begin_window
    spec = trainer.embed.pf_pack_spec(P * Bf)
    assert spec is not None
    # force a frozen spec: narrow the widest features to 8 bits
    nspec = tuple(
        (8 if w > 8 else w, d) for (w, d) in spec
    )
    trainer._esc_plain_spec = tuple(spec)
    trainer._esc_spec = ("esc", nspec, 64)
    # ids: mostly small, a few big (escapes), valid device addresses
    dev_rows = trainer._device_rows()
    slot3 = rng.integers(0, 50, size=(P, F, Bf), dtype=np.int64)
    for f, (w, delta) in enumerate(spec):
        hi = min(dev_rows, delta + (1 << w)) if delta else trainer.embed.capacity
        lo = delta
        # sprinkle 3 escape-worthy values per feature near the top of range
        idx = rng.integers(0, Bf, size=3)
        slot3[0, f, idx] = hi - 1 - np.arange(3)
        slot3[:, f, :] += lo if not delta else 0
    # resident features must carry their delta-offset addresses
    for f, (w, delta) in enumerate(spec):
        if delta:
            slot3[:, f, :] = (slot3[:, f, :] % (1 << w)) + delta
    slot3 = slot3.astype(np.int32)
    out = trainer._try_escape_encode(slot3, P, L, Bf)
    assert out is not None
    ids_bytes, id_width, expect = out
    assert ids_bytes.nbytes == expect
    from cachedembedding_tpu.train.trainer import _decode_window_ids

    layout = (P, L, Bf, 0, "float32", id_width, 0, 0, "float32")
    dec, end = _decode_window_ids(jax.numpy.asarray(ids_bytes), layout)
    assert end == expect
    np.testing.assert_array_equal(
        np.asarray(dec), slot3.transpose(0, 1, 2).reshape(P, L)
    )

    # overflow: every id of the narrowed features escapes -> None
    big3 = slot3.copy()
    for f, ((w, d), (pw, _)) in enumerate(zip(nspec, spec)):
        if w < pw and not d:
            big3[:, f, :] = trainer.embed.capacity - 1  # >= 2^8 everywhere
    assert trainer._try_escape_encode(big3, P, L, Bf) is None


def test_native_escape_pack_matches_python_encoder(monkeypatch):
    """The native windowed packer (hostops.escape_pack_window) must produce
    byte-identical output to the python encoder — both escape format and the
    plain per-feature-width fallback — since the device decoder consumes the
    bytes directly."""
    from cachedembedding_tpu._native import hostops

    if not hostops.native_available():
        import pytest

        pytest.skip("native lib not built")
    cfg = _cfg(True)
    trainer = CachedDLRMTrainer(cfg)
    P, F, Bf = 3, 4, 64
    L = F * Bf
    rng = np.random.default_rng(7)
    spec = trainer.embed.pf_pack_spec(P * Bf)
    nspec = tuple((8 if w > 8 else w, d) for (w, d) in spec)
    trainer._esc_plain_spec = tuple(spec)
    trainer._esc_spec = ("esc", nspec, 64)
    slot3 = rng.integers(0, 200, size=(P, F, Bf), dtype=np.int64)
    for f, (w, delta) in enumerate(spec):
        if delta:
            slot3[:, f, :] = (slot3[:, f, :] % (1 << w)) + delta
    slot3 = slot3.astype(np.int32)

    native = trainer._try_escape_encode(slot3, P, L, Bf)
    assert native is not None
    monkeypatch.setattr(hostops, "escape_pack_window", lambda *a, **k: None)
    python = trainer._try_escape_encode(slot3, P, L, Bf)
    assert python is not None
    assert native[1] == python[1] and native[2] == python[2]
    np.testing.assert_array_equal(native[0], python[0])
    monkeypatch.undo()

    # plain format path
    trainer._esc_spec = False
    native_p = trainer._escape_encode(slot3, spec, P, L, Bf)
    monkeypatch.setattr(hostops, "escape_pack_window", lambda *a, **k: None)
    python_p = trainer._escape_encode(slot3, spec, P, L, Bf)
    assert native_p[1] == python_p[1] and native_p[2] == python_p[2]
    np.testing.assert_array_equal(native_p[0], python_p[0])
