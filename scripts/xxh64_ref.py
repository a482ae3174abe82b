"""Independent pure-Python XXH64 (public algorithm, Cyan4973/xxHash spec).

Used only by scripts/pin_oracles.py to compute the q_stream_ingest
expected output without invoking the engine's JVM xxhash64 — an
independent implementation of the same published hash so the pinned
oracle is not self-referential.
"""
M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (
    11400714785074694791, 14029467366897019727, 1609587929392839161,
    9650029242287828579, 2870177450012600261,
)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            for k, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * k : i + 8 * k + 8], "little")
                v = (v + lane * P2) & M
                v = (_rotl(v, 31) * P1) & M
                if k == 0: v1 = v
                elif k == 1: v2 = v
                elif k == 2: v3 = v
                else: v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * P2) & M, 31) * P1) & M
            h = (((h ^ v) * P1) + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((lane * P2) & M, 31) * P1) & M
        h = ((_rotl(h, 27) * P1) + P4) & M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h ^= (lane * P1) & M
        h = ((_rotl(h, 23) * P2) + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Two's-complement int64 view (what Spark's xxhash64 column holds)."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
