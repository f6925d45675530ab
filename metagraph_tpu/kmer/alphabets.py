"""Alphabets and encoding tables.

Semantics mirror the reference tables in
/root/reference/metagraph/src/kmer/alphabets.hpp (values re-derived, not copied):
the BOSS alphabet prepends the sentinel '$' (code 0) to the base alphabet, and
characters outside the alphabet encode to `sigma` (an invalid code that splits
sequences into valid segments).

We use the BOSS (sentinel-included) code space everywhere: $=0, A=1, C=2, G=3,
T=4 for DNA.  Real k-mers never contain code 0, so comparisons of real k-mers in
this space order identically to the reference's sentinel-free 2-bit space.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Alphabet:
    """A BOSS-style alphabet with sentinel at code 0."""

    name: str
    letters: str          # including leading sentinel, e.g. "$ACGT"
    complement: tuple     # complement code map over codes [0..sigma-1], or () if none

    @property
    def sigma(self) -> int:
        return len(self.letters)

    @property
    def sentinel(self) -> str:
        return self.letters[0]

    @property
    def encode_table(self) -> np.ndarray:
        """(256,) uint8: byte -> code; invalid bytes -> sigma."""
        table = np.full(256, self.sigma, dtype=np.uint8)
        for code, ch in enumerate(self.letters):
            if code == 0:
                continue  # sentinel is not a valid input character
            table[ord(ch)] = code
            table[ord(ch.lower())] = code
        return table

    @property
    def decode_table(self) -> np.ndarray:
        """(sigma+1,) uint8 of character bytes (invalid code -> 'N')."""
        out = np.frombuffer((self.letters + "N").encode(), dtype=np.uint8).copy()
        return out

    @property
    def complement_table(self) -> np.ndarray:
        if not self.complement:
            raise ValueError(f"alphabet {self.name} has no complement")
        return np.array(self.complement, dtype=np.uint8)


# DNA: ref alphabets.hpp:64-79 ($ACGT, complement $<->$, A<->T, C<->G;
# U encodes as T; everything else, incl. N, is invalid)
DNA = Alphabet("DNA", "$ACGT", (0, 4, 3, 2, 1))


def dna_encode_table() -> np.ndarray:
    table = DNA.encode_table
    table[ord("U")] = 4
    table[ord("u")] = 4
    return table


# DNA5: ref alphabets.hpp:81-85 ($ACGTN; N is a real character, self-complementary)
DNA5 = Alphabet("DNA5", "$ACGTN", (0, 4, 3, 2, 1, 5))

# Protein: ref alphabets.hpp:26-41 (no complement; X at the end is the catch-all)
PROTEIN = Alphabet("Protein", "$ABCDEFGHIJKLMNOPQRSTUVWYZX", ())

# Case-sensitive DNA: ref alphabets.hpp:107-123 ($ACGTNacgt; complement maps
# A<->t, C<->g, G<->c, T<->a, N<->N — case flips across strands)
DNA_CS = Alphabet("DNA_CASE", "$ACGTNacgt", (0, 9, 8, 7, 6, 5, 4, 3, 2, 1))


ALPHABETS = {a.name: a for a in (DNA, DNA5, PROTEIN, DNA_CS)}
