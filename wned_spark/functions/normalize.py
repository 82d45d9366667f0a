"""Surface-form normalizers — pure Catalyst expressions (no Python).

R9 (``CandidateSelectionLucene.java:95,161``): whitespace-collapse +
trim + lowercase — the canonical blocking-key normalizer.

R8 (``cs/MentionExpansion.java:160-192``): strip honorific prefixes and
corporate suffixes before matching. The reference's lists (mr./mrs./dr./
gen./... and ltd./co./inc./corp./...) are reproduced as a regex
alternation; applied on the already-lowercased form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MentionExpansion.java:160-192 prefix/suffix token sets
_HONORIFIC_RE = (
    r"^(mr|mrs|ms|miss|dr|prof|gen|rep|sen|st|sr|jr|rev|fr|hon|gov|pres)\.?\s+"
)
_CORP_SUFFIX_RE = r"\s+(ltd|co|inc|corp|llc|plc|gmbh)\.?$"


def norm_whitespace_lower(col: Column) -> Column:
    """R9: lower(trim(regexp_replace(s, '\\s+', ' ')))."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def strip_honorifics(col: Column) -> Column:
    """R8 on a lowercased column: drop honorific prefix + corporate
    suffix + trailing dot."""
    c = F.regexp_replace(col, _HONORIFIC_RE, "")
    c = F.regexp_replace(c, _CORP_SUFFIX_RE, "")
    return F.regexp_replace(c, r"\.$", "")


def norm_surface(col: Column) -> Column:
    """Full normalizer used for blocking keys and dictionary joins:
    R9 then R8."""
    return strip_honorifics(norm_whitespace_lower(col))
