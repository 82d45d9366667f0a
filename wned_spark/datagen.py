"""Deterministic synthetic transcript corpus with planted entity mentions.

Implements FIXTURES.md F1-F5. The reference's benchmark input is
gold-annotated XML documents (``SemanticSignatureEL.java:988-1075``); the
rebuild's input is an ``input_hint``-shaped transcripts table
``(conv_id, turn_idx, role, text, tool, ts)`` with a mention-level gold
table, generated entirely from a seed — no external data.

Design for scale: transcripts are generated DISTRIBUTED — the driver only
builds the (small) entity/alias dimension; conversations are produced by
``mapInPandas`` over ``spark.range(n_conversations)`` with a per-
conversation RNG seeded by ``base_seed + conv_index``, so output is
bit-identical regardless of partitioning or core count (required for the
local[8] vs local[32] scaling comparison).

Alias variants mirror the reference's alias sources
(``kb/KBExtractor.java:119,139,157,161``: name / redirect / disambig /
link) and its normalizer's honorific/suffix cases
(``cs/MentionExpansion.java:160-192``):
  canonical, surname-only, initialed, honorific/corp-suffixed,
  adjacent-char-swap misspelling, char-drop misspelling, and (at
  ``ambiguity_rate``) an intentionally ambiguous all-caps acronym shared
  across entities — the case string similarity alone cannot resolve and
  the PPR semantic signature must.

Mentions are extractable exactly: alias tokens are capitalized; all
filler text is lowercase.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# 16 syllables → base-16 digit encoding of entity_id gives every entity a
# unique 3-syllable surname (collision-free up to 4096 entities; a 4th
# syllable is appended past that).
_SYLLABLES = [
    "bar", "den", "fol", "gar", "hul", "jor", "kel", "lam",
    "mor", "nor", "pel", "ril", "sor", "tal", "ver", "wim",
]
_FIRST_NAMES = [
    "Alice", "Bruno", "Carla", "Derek", "Elena", "Farid", "Greta", "Hugo",
    "Irene", "Jonas", "Katya", "Liam", "Mona", "Nadia", "Oscar", "Priya",
    "Quinn", "Rosa", "Stefan", "Tara", "Umar", "Vera", "Wendel", "Xenia",
    "Yusuf", "Zelda", "Anders", "Bianca", "Cedric", "Dalia", "Emilio", "Freya",
]
_ORG_SUFFIXES = ["Systems", "Labs", "Industries", "Group", "Analytics", "Logistics"]
_HONORIFICS = ["Dr.", "Mr.", "Ms.", "Prof."]
_CORP_TAILS = ["Inc.", "Ltd.", "Co."]
_TOOLS = ["search", "calculator", "crm_lookup", "ticket_api", "sql_runner"]
_ROLES = ["user", "assistant", "tool"]

# Filler templates — strictly lowercase so capitalized-run mention
# extraction is exact. "{m}" slots get a planted mention.
_TEMPLATES_1 = [
    "the customer asked about the invoice from {m} regarding shipment delays",
    "please escalate the ticket filed by {m} before the end of the week",
    "we reviewed the contract with {m} and found two open clauses",
    "the latest report mentions {m} in the quarterly summary",
    "a follow-up call with {m} is scheduled for tomorrow morning",
    "records show {m} submitted the form twice last month",
    "the account owned by {m} was flagged for manual review",
]
_TEMPLATES_2 = [
    "the meeting between {m} and {m} covered the renewal terms",
    "both {m} and {m} appear on the shared purchase order",
    "we compared the proposals from {m} and {m} side by side",
    "the dispute involves {m} as well as {m} according to the log",
]
_TEMPLATES_0 = [
    "the shipment is still pending at the regional warehouse",
    "no further action is required on this thread for now",
    "the system retried the job three times before succeeding",
    "please confirm the delivery window with the logistics team",
    "the invoice total was recalculated after the discount update",
]

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

GOLD_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("surface", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("entity_id", T.LongType(), False),
])

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


def surname_for(entity_id: int) -> str:
    """Unique deterministic surname per entity id.

    The id is scrambled through a bijective odd-multiplier map inside
    the smallest 16^k block covering it, so consecutive ids (which land
    in the same co-occurrence community) get unrelated syllables —
    realistic negatives, not adversarial 1-edit-apart ones.
    """
    k = 3
    while 16**k <= entity_id:
        k += 1
    m = (entity_id * 2741) % (16**k)
    parts = []
    for _ in range(k):
        parts.append(_SYLLABLES[m % 16])
        m //= 16
    return "".join(parts).capitalize()


@dataclass
class AliasRow:
    entity_id: int
    alias: str
    source: str  # name | redirect | disambig | link (KBExtractor.java sources)
    freq: int


def _swap_chars(s: str, pos: int) -> str:
    pos = pos % max(1, len(s) - 1)
    if s[pos] == s[pos + 1]:
        pos = (pos + 1) % max(1, len(s) - 1)
    return s[:pos] + s[pos + 1] + s[pos] + s[pos + 2:]


def _drop_char(s: str, pos: int) -> str:
    pos = 1 + pos % max(1, len(s) - 2)  # never drop the first char
    return s[:pos] + s[pos + 1:]


def build_entities(n_entities: int, seed: int = 42) -> pd.DataFrame:
    """F2: synthetic KB. PER/ORG split; unique canonical names."""
    rows = []
    for eid in range(n_entities):
        rng = random.Random((seed << 20) ^ eid)
        surname = surname_for(eid)
        if eid % 2 == 0:
            name = f"{rng.choice(_FIRST_NAMES)} {surname}"
            etype = "PER"
        else:
            name = f"{surname} {rng.choice(_ORG_SUFFIXES)}"
            etype = "ORG"
        rows.append((eid, name, etype))
    return pd.DataFrame(rows, columns=["entity_id", "name", "type"])


def build_alias_rows(
    entities: pd.DataFrame,
    seed: int = 42,
    ambiguity_rate: float = 0.0,
    misspell_boost: int = 1,
    hot_token_rate: float = 0.0,
) -> pd.DataFrame:
    """F3 precursor: alias variants per entity with sampled frequencies.

    Sources mirror KBExtractor.java:119-161; the ambiguous acronym
    plays the role of a 'disambig' alias (one surface, many entities).

    Adversarial-regime knobs (round-3 verdict item 6):
    ``misspell_boost`` multiplies the draw frequency of the two
    misspelled variants, making fuzzy blocking + JW/SoftTFIDF
    load-bearing rather than incidental; ``hot_token_rate`` gives that
    fraction of entities an extra alias ending in the SAME Zipf-hot
    token ("<surname> International"), planting hot blocking keys that
    salting must split and IDF weighting must down-rank."""
    rows: list[AliasRow] = []
    for eid, name, etype in entities[["entity_id", "name", "type"]].itertuples(index=False):
        rng = random.Random((seed << 21) ^ eid)
        parts = name.split(" ")
        surname = parts[0] if etype == "ORG" else parts[1]
        rows.append(AliasRow(eid, name, "name", 40 + rng.randrange(60)))
        rows.append(AliasRow(eid, surname, "redirect", 20 + rng.randrange(30)))
        if etype == "PER":
            rows.append(AliasRow(eid, f"{parts[0][0]}. {surname}", "redirect", 10 + rng.randrange(20)))
            rows.append(AliasRow(eid, f"{rng.choice(_HONORIFICS)} {name}", "link", 5 + rng.randrange(10)))
        else:
            rows.append(AliasRow(eid, f"{name} {rng.choice(_CORP_TAILS)}", "link", 5 + rng.randrange(10)))
        # misspellings (edit distance 1-2), 'link' source
        rows.append(AliasRow(
            eid, name.replace(surname, _swap_chars(surname, rng.randrange(2, 7))),
            "link", (2 + rng.randrange(5)) * misspell_boost))
        rows.append(AliasRow(
            eid, name.replace(surname, _drop_char(surname, rng.randrange(2, 7))),
            "link", (1 + rng.randrange(4)) * misspell_boost))
        if rng.random() < hot_token_rate:
            rows.append(AliasRow(eid, f"{surname} International", "link",
                                 8 + rng.randrange(10)))
        if rng.random() < ambiguity_rate:
            acro = "".join(p[0] for p in parts).upper()
            # 2-letter acronyms collide across entities by construction.
            # Frequency comparable to the canonical name: when ambiguity
            # is requested, acronym mentions must be COMMON enough that
            # unresolved ones measurably break the pairwise gate (a
            # token-rare alias would vanish into the F1's fourth digit).
            rows.append(AliasRow(eid, acro, "disambig", 40 + rng.randrange(40)))
    return pd.DataFrame([r.__dict__ for r in rows])


def _gen_conversation(
    conv_index: int,
    seed: int,
    alias_lookup: dict[int, list[tuple[str, int]]],
    n_entities: int,
    community_size: int,
    turns_per_conv: int,
    name_lookup: dict[int, str] | None = None,
    paren_def_rate: float = 0.0,
):
    """Generate one conversation; returns (turn_rows, gold_rows).

    Entities are drawn from a single 'community' (entity_id block) so an
    entity's co-occurrence neighborhood is stable across conversations —
    this is the signal the PPR semantic signature exploits, mirroring the
    reference's co-occurrence graph (WikiGraphExtractor.java:63-85).

    ``paren_def_rate`` (adversarial regime): with this probability the
    conversation introduces one cast entity ONLY as an acronym defined
    by a lowercase parenthetical — "note: the kelbar systems (KS) case
    is ongoing" — and every later mention of that entity uses the bare
    acronym. The long form never appears as a capitalized mention, so
    resolution depends entirely on the R10 pattern miner.
    """
    rng = random.Random((seed << 22) ^ conv_index)
    conv_id = f"conv-{conv_index:08d}"
    n_comm = max(1, n_entities // community_size)
    comm = rng.randrange(n_comm)
    lo = comm * community_size
    pool = list(range(lo, min(lo + community_size, n_entities)))
    cast = rng.sample(pool, min(len(pool), rng.randrange(3, 6)))

    paren_ent = None
    paren_acro = ""
    if name_lookup is not None and paren_def_rate > 0 and rng.random() < paren_def_rate:
        paren_ent = rng.choice(cast)
        pname = name_lookup[paren_ent]
        paren_acro = "".join(w[0] for w in pname.split()).upper()

    turn_rows, gold_rows = [], []
    for t in range(turns_per_conv):
        role = _ROLES[t % 3]
        tool = rng.choice(_TOOLS) if role == "tool" else None
        if paren_ent is not None and t == 0:
            pname = name_lookup[paren_ent]
            head = f"note: the {pname.lower()} ("
            text = f"{head}{paren_acro}) case is ongoing"
            gold_rows.append(
                (conv_id, 0, paren_acro, len(head), len(head) + len(paren_acro), paren_ent)
            )
            ts = _BASE_TS + timedelta(seconds=conv_index * 3600 + t * 30)
            turn_rows.append((conv_id, t, role, text, tool, ts))
            continue
        draw = rng.random()
        if draw < 0.15:
            text = rng.choice(_TEMPLATES_0)
            mentions_here = []
        elif draw < 0.75:
            tmpl = rng.choice(_TEMPLATES_1)
            mentions_here = [rng.choice(cast)]
            text = tmpl
        else:
            tmpl = rng.choice(_TEMPLATES_2)
            mentions_here = rng.sample(cast, 2) if len(cast) >= 2 else [cast[0], cast[0]]
            text = tmpl
        if mentions_here:
            pieces = text.split("{m}")
            out, pos = [], 0
            for i, piece in enumerate(pieces):
                out.append(piece)
                pos += len(piece)
                if i < len(mentions_here) and i < len(pieces) - 1:
                    eid = mentions_here[i]
                    if eid == paren_ent:
                        # paren-defined entity appears ONLY as its acronym
                        surface = paren_acro
                    else:
                        aliases = alias_lookup[eid]
                        total = sum(f for _, f in aliases)
                        pick = rng.randrange(total)
                        acc = 0
                        surface = aliases[0][0]
                        for a, f in aliases:
                            acc += f
                            if pick < acc:
                                surface = a
                                break
                    out.append(surface)
                    gold_rows.append((conv_id, t, surface, pos, pos + len(surface), eid))
                    pos += len(surface)
            text = "".join(out)
        ts = _BASE_TS + timedelta(seconds=conv_index * 3600 + t * 30)
        turn_rows.append((conv_id, t, role, text, tool, ts))
    return turn_rows, gold_rows


def generate_corpus(
    spark: SparkSession,
    n_conversations: int = 200,
    turns_per_conv: int = 12,
    n_entities: int = 64,
    community_size: int = 8,
    seed: int = 42,
    ambiguity_rate: float = 0.0,
    misspell_boost: int = 1,
    paren_def_rate: float = 0.0,
    hot_token_rate: float = 0.0,
) -> dict[str, DataFrame]:
    """Generate the full fixture set: transcripts, entities, alias_dict,
    gold_mentions. Distributed + deterministic (per-conversation seeds).

    The three adversarial knobs (``misspell_boost`` /
    ``paren_def_rate`` / ``hot_token_rate``) compose freely with the
    clean regime — see :func:`build_alias_rows` and
    :func:`_gen_conversation`.
    """
    entities_pdf = build_entities(n_entities, seed)
    alias_pdf = build_alias_rows(
        entities_pdf, seed, ambiguity_rate,
        misspell_boost=misspell_boost, hot_token_rate=hot_token_rate,
    )
    alias_lookup: dict[int, list[tuple[str, int]]] = {}
    for eid, alias, _src, freq in alias_pdf[["entity_id", "alias", "source", "freq"]].itertuples(index=False):
        alias_lookup.setdefault(int(eid), []).append((alias, int(freq)))
    name_lookup = {
        int(eid): str(name)
        for eid, name in entities_pdf[["entity_id", "name"]].itertuples(index=False)
    }

    sc = spark.sparkContext
    bc = sc.broadcast((
        alias_lookup, n_entities, community_size, turns_per_conv, seed,
        name_lookup, paren_def_rate,
    ))

    def gen_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup, n_ent, comm_sz, tpc, sd, names, pdr = bc.value
        for pdf in batches:
            turn_acc = []
            for conv_index in pdf["id"]:
                turns, _gold = _gen_conversation(
                    int(conv_index), sd, lookup, n_ent, comm_sz, tpc,
                    name_lookup=names, paren_def_rate=pdr,
                )
                turn_acc.extend(turns)
            if turn_acc:
                yield pd.DataFrame(
                    turn_acc, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
                )

    def gen_gold_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup, n_ent, comm_sz, tpc, sd, names, pdr = bc.value
        for pdf in batches:
            gold_acc = []
            for conv_index in pdf["id"]:
                _turns, gold = _gen_conversation(
                    int(conv_index), sd, lookup, n_ent, comm_sz, tpc,
                    name_lookup=names, paren_def_rate=pdr,
                )
                gold_acc.extend(gold)
            if gold_acc:
                yield pd.DataFrame(
                    gold_acc,
                    columns=["conv_id", "turn_idx", "surface", "start", "end", "entity_id"],
                )

    base = spark.range(n_conversations)
    transcripts = base.mapInPandas(gen_partition, schema=TRANSCRIPT_SCHEMA)
    gold = base.mapInPandas(gen_gold_partition, schema=GOLD_SCHEMA)

    entities = spark.createDataFrame(entities_pdf)
    alias_raw = spark.createDataFrame(alias_pdf)
    return {
        "transcripts": transcripts,
        "entities": entities,
        "alias_raw": alias_raw,
        "gold_mentions": gold,
    }
