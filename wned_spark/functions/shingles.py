"""Character shingles + MinHash — pure Catalyst expressions.

Replaces the reference's Lucene character-bigram fuzzy index
(``common/indexing/AliasLuceneIndex.java:247-300``) with MinHash-LSH
band keys computed entirely JVM-side: shingling via ``sequence`` +
``substring`` higher-order transforms, per-permutation min-hash via
``array_min(transform(shingles, xxhash64(., seed_i)))``, band keys via
``xxhash64`` over the concatenated band slice. No UDFs, no Spark-ML
vector assembly — the whole blocking-key computation stays inside
whole-stage codegen, which is what survives a 100 TB scan.

Seeds are pinned constants → deterministic across runs and parallelism
levels (required for the fixed-blocking-key F1 gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(col: Column, n: int = 2, distinct: bool = True) -> Column:
    """Array of character n-grams of a string column (JVM-side).

    shingles(s) = [ substring(s, i+1, n) | i <- 0 .. len(s)-n ]
    Short strings (< n chars) yield the string itself as one shingle.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.length(col) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: col.substr(i + 1, F.lit(n)))
    return F.array_distinct(grams) if distinct else grams


def _min_perm_hash(shingles: Column, perm: int) -> Column:
    """min over shingles of xxhash64(shingle, seed_perm) — one MinHash
    permutation. MUST be built via this closure factory: a defaulted
    two-parameter lambda (``lambda s, i=i:``) is interpreted by
    ``F.transform`` as an (element, array_index) lambda, silently
    rebinding ``i`` to the index column and collapsing every
    permutation onto one hash function (the arity trap that bit RP-LSH
    in round 1 and MinHash in rounds 1-2; see tests/test_functions.py
    lambda-arity guard)."""
    seed = 1000003 + perm

    def _hash_one(s: Column) -> Column:  # single-arg: element only
        return F.xxhash64(s, F.lit(seed))

    return F.coalesce(F.array_min(F.transform(shingles, _hash_one)), F.lit(-seed))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """Array of ``num_hashes`` min-hash values: element h is
    min(xxhash64(shingle, seed_h)) over the shingle set. Empty shingle
    arrays hash to a sentinel derived from the seed so they still block
    deterministically (only with other empties)."""
    return F.array(*[_min_perm_hash(shingles, i) for i in range(num_hashes)])


def minhash_band_keys_direct(
    shingles: Column, num_hashes: int = 16, band_size: int = 4
) -> Column:
    """Band keys computed straight from the shingle array — each band
    key touches ONLY its own band's hash permutations, so the total
    work is exactly ``num_hashes`` array_min-transforms.

    (Composing ``minhash_band_keys(minhash_signature(...))`` instead
    inlines the full signature expression into every band key after
    Catalyst's projection collapse — an n_bands× recompute that showed
    up as 8× wall time on the dedup benchmark.)
    """
    n_bands = num_hashes // band_size
    keys = []
    for b in range(n_bands):
        parts = [F.lit(b)] + [
            _min_perm_hash(shingles, b * band_size + j) for j in range(band_size)
        ]
        keys.append(F.xxhash64(*parts))
    return F.array(*keys)


def minhash_band_keys(signature: Column, num_hashes: int = 16, band_size: int = 4) -> Column:
    """LSH band keys: split the signature into bands of ``band_size``
    rows; each band key = xxhash64(band_index, sig[b..b+r)). Two strings
    share a band key iff a whole band of min-hashes agrees — the
    standard S-curve collision profile."""
    n_bands = num_hashes // band_size
    keys = []
    for b in range(n_bands):
        parts = [F.lit(b)] + [
            F.element_at(signature, b * band_size + j + 1) for j in range(band_size)
        ]
        keys.append(F.xxhash64(*parts))
    return F.array(*keys)
