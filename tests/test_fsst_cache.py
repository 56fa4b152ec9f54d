"""Per-task FSST symbol cache (chunk.encode_bytes fsst_cache): the
selector's priciest probe is symbol training (~4x the actual encode
cost), so adjacent pages of one column reuse a trained table and
retrain every _FSST_REUSE_PAGES pages. The estimate prices exactly
what the encode emits with the cached table, so codec selection stays
honest — staleness may cost a little compression, never correctness."""

from __future__ import annotations

import numpy as np

from pysparkenc import chunk as chunklib
from pysparkenc.chunk import _FSST_REUSE_PAGES
from pysparkenc.kernels.fsst import fsst_encoded_size_estimate, train_symbols
from pysparkenc.selector import select_bytes


def _pages(n_pages: int, rows: int = 300, seed: int = 3):
    """Near-stationary compressible text pages, like one column's stream."""
    rng = np.random.default_rng(seed)
    words = [b"tokenizer", b"pipeline", b"spark", b"columnar", b"encode"]
    out = []
    for _ in range(n_pages):
        vals = [
            b"http://example.com/" + b"/".join(rng.choice(words, size=4))
            for _ in range(rows)
        ]
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        off = np.zeros(rows + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        out.append((off, b"".join(vals)))
    return out


def test_cache_reuses_symbols_and_roundtrips():
    cache: dict = {}
    trained = []
    for off, data in _pages(6):
        ck = chunklib.encode_bytes("u", off, data, None, logical="string",
                                   fsst_cache=cache)
        assert ck.codec == "fsst"
        got_off, got_data = chunklib.decode_bytes({**ck.__dict__})
        assert got_data == data and (got_off == off).all()
        trained.append(cache["u"][0])
    # one table trained on page 1, reused (same object) on pages 2..6
    assert all(t is trained[0] for t in trained)
    assert cache["u"][1] == 5  # five reuses counted


def test_cache_retrains_after_reuse_window():
    cache: dict = {}
    pages = _pages(_FSST_REUSE_PAGES + 2)
    first = None
    for off, data in pages:
        chunklib.encode_bytes("u", off, data, None, logical="string",
                              fsst_cache=cache)
        if first is None:
            first = cache["u"][0]
    # the window expired -> a fresh table replaced the first one
    assert cache["u"][0] is not first
    assert cache["u"][1] < _FSST_REUSE_PAGES


def test_cached_size_overhead_is_bounded():
    pages = _pages(8)
    cache: dict = {}
    cached = [
        chunklib.encode_bytes("u", off, data, None, logical="string",
                              fsst_cache=cache).enc_bytes
        for off, data in pages
    ]
    fresh = [
        chunklib.encode_bytes("u", off, data, None, logical="string").enc_bytes
        for off, data in pages
    ]
    assert sum(cached) <= sum(fresh) * 1.03  # staleness costs <3% here


def test_estimate_with_reused_symbols_is_honest():
    (off, data), = _pages(1, rows=800)
    syms = train_symbols(bytes(data[: off[64]]))
    est, out_syms = fsst_encoded_size_estimate(off, data, symbols=syms)
    assert out_syms is syms
    from pysparkenc.kernels.fsst import fsst_encode

    actual = len(fsst_encode(off, data, syms))
    assert abs(est - actual) / actual < 0.25


def test_stale_symbols_never_fool_the_selector():
    # symbols trained on URLs, offered to incompressible binary: the
    # estimate prices the bad fit and the selector walks away from FSST
    (off, data), = _pages(1)
    syms = train_symbols(bytes(data))
    rng = np.random.default_rng(11)
    vals = [bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
            for _ in range(400)]
    lens = np.array([len(v) for v in vals], dtype=np.int64)
    goff = np.zeros(401, dtype=np.int64)
    np.cumsum(lens, out=goff[1:])
    gdata = b"".join(vals)
    choice = select_bytes(goff, gdata, fsst_symbols=syms)
    assert choice.codec != "fsst"
    ck = chunklib.encode_bytes("g", goff, gdata, None, logical="bytes",
                               fsst_cache={"g": [syms, 0]})
    got_off, got_data = chunklib.decode_bytes({**ck.__dict__})
    assert got_data == gdata and (got_off == goff).all()


def test_forced_codec_bypasses_cache():
    (off, data), = _pages(1)
    cache: dict = {}
    ck = chunklib.encode_bytes("u", off, data, "ba_plain", logical="string",
                               fsst_cache=cache)
    assert ck.codec == "ba_plain" and not cache
