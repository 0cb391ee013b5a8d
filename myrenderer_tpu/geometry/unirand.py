"""Repeat-free random permutation iterator.

Capability match for the reference's ``Polygon/unirand.zig``: visits every
integer in ``[0, top)`` exactly once in a pseudo-random order using
``(i * prime + offset) % top`` with ``prime`` coprime to ``top``
(``unirand.zig:12-21``), with the prime drawn from a fixed table
(``unirand.zig:24``).

Deliberate improvement over the reference (SURVEY.md §2.5): the reference
seeds from ``std.crypto.random`` (``unirand.zig:31``) making triangulation
insertion order non-deterministic across runs. We take an explicit integer
seed (default 0) so renders are reproducible.
"""

from __future__ import annotations

import numpy as np

# Same prime table as unirand.zig:24.
_PRIMES = (
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
    71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149,
    151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229,
    233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293, 307, 311, 313,
    317, 331, 337, 347, 349, 353, 359, 367, 373, 379, 383, 389, 397, 401, 409,
    419, 421, 431, 433, 439, 443, 449, 457, 461, 463, 467, 479, 487, 491, 499,
    503, 509, 521, 523, 541, 601, 659, 733, 809, 863, 941, 1013, 1069, 1151,
    1283, 1289, 1367, 1447, 1499, 1579, 1637, 1723, 429494501, 429493501,
    429486647, 100001053, 100002421, 10001567,
)


class Unirand:
    """Iterator yielding each of ``0..top-1`` exactly once."""

    def __init__(self, top: int, offset: int, prime: int):
        self.at = 0
        self.top = top
        self.offset = offset
        self.prime = prime

    def __iter__(self):
        return self

    def __next__(self) -> int:
        if self.top > 0 and self.at < self.top:
            result = (self.at * self.prime + self.offset) % self.top
            self.at += 1
            return result
        raise StopIteration


def unirand_seed(top: int, seed: int = 0) -> Unirand:
    """Build a permutation iterator over ``[0, top)``.

    Selection mirrors ``unirand.zig:26-50``: random offset in [1, top),
    and the prime is the last table entry below ``top``, coprime to
    ``top``, surviving a 2/3-probability coin flip — but driven by a
    seeded PCG64 instead of the OS CSPRNG.
    """
    if top <= 0:
        return Unirand(0, 0, 1)
    rng = np.random.Generator(np.random.PCG64(seed))
    if top == 1:
        return Unirand(1, 0, 1)
    offset = int(rng.integers(0, 2**32)) % (top - 1) + 1
    best_prime = 1
    for prime in _PRIMES:
        if prime < top and top % prime != 0 and int(rng.integers(0, 2**32)) % 3 > 0:
            best_prime = prime
    return Unirand(top, offset, best_prime)
