"""Optional block compression, orthogonal to the encodings.

Mirrors the reference's ``compression.BlockCompressor`` layer
(``/root/reference/compression/compressor.go:3-6``, registry at
``file-reader.go:316-325``): compression is applied to an already-encoded
chunk payload and recorded per chunk, never baked into the codec framing.
The north star scores *encoding* size, so compression defaults to off and
is opt-in per ``encode_table(compression=...)``.

Only stdlib zlib is guaranteed in this container; zstd / lz4 / snappy are
import-gated exactly like the reference's codec registry (unregistered
codec -> explicit error, ``compression/compressor.go``).
"""

from __future__ import annotations

import zlib
from collections.abc import Callable

# name -> (compress, decompress)
_REGISTRY: dict[str, tuple[Callable[[bytes], bytes], Callable[[bytes], bytes]]] = {
    "gzip": (lambda b: zlib.compress(b, 6), zlib.decompress),
}

try:  # pragma: no cover - not in this container
    import zstandard as _zstd

    _REGISTRY["zstd"] = (
        lambda b: _zstd.ZstdCompressor(level=3).compress(b),
        lambda b: _zstd.ZstdDecompressor().decompress(b),
    )
except ImportError:
    pass

try:  # pragma: no cover - not in this container
    import lz4.frame as _lz4f

    _REGISTRY["lz4"] = (_lz4f.compress, _lz4f.decompress)
except ImportError:
    pass

try:  # pragma: no cover - not in this container
    import snappy as _snappy

    _REGISTRY["snappy"] = (_snappy.compress, _snappy.decompress)
except ImportError:
    pass

try:  # pragma: no cover - not in this container
    import brotli as _brotli

    # the reference's remaining codec (compression/brotli.go); quality 5
    # mirrors its default window of speed-vs-ratio
    _REGISTRY["brotli"] = (
        lambda b: _brotli.compress(b, quality=5),
        _brotli.decompress,
    )
except ImportError:
    pass


def available() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


def compress(name: str, payload: bytes) -> bytes:
    if name not in _REGISTRY:
        raise ValueError(
            f"block compression {name!r} not available (have {available()})"
        )
    return _REGISTRY[name][0](payload)


def decompress(name: str, payload: bytes) -> bytes:
    if name not in _REGISTRY:
        raise ValueError(
            f"block compression {name!r} not available (have {available()})"
        )
    return _REGISTRY[name][1](payload)
