from wned_spark.functions.normalize import norm_surface, strip_honorifics  # noqa: F401
from wned_spark.functions.similarity import (  # noqa: F401
    bigram_dice,
    cosine_expr,
    jaro_winkler_udf,
    levenshtein_norm,
    milne_witten,
    zero_kl_divergence_udf,
)
from wned_spark.functions.shingles import char_shingles, minhash_band_keys, minhash_signature  # noqa: F401
