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


_OPH_SEED = 0x9E3779B1
_MAX_LONG = (1 << 63) - 1


def oph_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """One-permutation-hashing MinHash sketch (Li/Owen/Zhang 2012): hash
    every shingle ONCE, partition the 64-bit hash space into
    ``num_hashes`` bins by ``pmod``, keep the min hash per bin. Empty
    bins hold the ``_MAX_LONG`` sentinel — densify with
    :func:`oph_densify` before banding.

    This column form is the SPEC kernel: tests pin the estimator
    properties here and pin the production path against it. Production
    (``dedup._oph_bands``) computes the SAME bins relationally —
    Spark's higher-order array functions are CodegenFallback
    (interpreted, boxing per element), so this k-bin accumulator
    allocates a fresh array per shingle and measured ~25× slower than
    the explode → groupBy-min formulation at sf0.1. The 2-param
    transform lambda here is the INTENTIONAL (element, index) form —
    index is the bin id (the legitimate use of the arity the
    defaulted-lambda guard protects against misusing)."""
    hashed = F.transform(shingles, lambda s: F.xxhash64(s, F.lit(_OPH_SEED)))
    init = F.array_repeat(F.lit(_MAX_LONG), num_hashes)

    def merge(acc: Column, h: Column) -> Column:
        return F.transform(
            acc,
            lambda v, i: F.when(
                F.pmod(h, F.lit(num_hashes)) == i, F.least(v, h)
            ).otherwise(v),
        )

    return F.aggregate(hashed, init, merge)


def oph_densify(sig: Column, num_hashes: int = 16) -> Column:
    """Rotation densification for an OPH sketch: an empty bin i borrows
    the value of the nearest non-empty bin (i+j) mod k, re-mixed by the
    borrow distance (``xxhash64(value, j)``) so a borrowed agreement is
    distinct from a direct one — the standard densified-OPH estimator.
    The forward scan covers the FULL cycle (a sparse document — few
    distinct shingles — routinely leaves gaps of many consecutive empty
    bins, so a bounded chain would silently diverge from the relational
    production kernel, which borrows at any distance); only a document
    with zero shingles falls through to the bin-indexed constant, so
    fully-empty documents band deterministically and only with other
    empties — same convention as :func:`minhash_signature` and
    ``dedup._oph_bands``.

    Call on a MATERIALIZED signature attribute (post-explode/aggregate
    barrier), not a composed expression: each output element reads
    ``sig`` several times, and projection collapse would otherwise
    duplicate the whole sketch build per reference."""
    def dense(i: int) -> Column:
        cands = []
        for j in range(num_hashes):
            v = F.element_at(sig, ((i + j) % num_hashes) + 1)
            vv = v if j == 0 else F.xxhash64(v, F.lit(j))
            cands.append(F.when(v != F.lit(_MAX_LONG), vv))
        cands.append(F.xxhash64(F.lit(i), F.lit(-1)))
        return F.coalesce(*cands)

    return F.array(*[dense(i) for i in range(num_hashes)])


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
