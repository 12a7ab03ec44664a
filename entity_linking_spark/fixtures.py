"""Deterministic synthetic fixture generator (FIXTURES.md).

Generates the north-rule input table — Common-Crawl-style pages
(url, warc_ts, html, text, lang) — plus labeled mentions, an entity
catalog, labeled pairs, and golden clusters.  Everything is a pure
function of the seed: same seed ⇒ byte-identical tables, which is what
makes the byte-identical-extraction and determinism gates enforceable.

Shape mirrors the reference's data model (ZESHEL mentions/entities,
reference test/data/mentions_train.json, entities_train.json;
transform at src/transform_zeshel.py:9-36), rebased onto web pages:

- each entity has a distinctive context vocabulary (disjoint across
  entities) — the stand-in for the reference's entity description text
  that lets context embeddings disambiguate near-duplicate titles;
- mention surfaces carry seeded noise: exact / case-change / typo /
  token-swap / dropped-suffix alias — exercising Jaro-Winkler,
  Levenshtein, and blocking recall;
- "hot" entities absorb ~20% of mentions (Zipf head) to exercise
  salting / AQE skew handling;
- near-duplicate entity pairs (edit distance 1-2 titles, e.g.
  '... mark1' vs '... mark2') that must NOT merge.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import numpy as np

ADJECTIVES = [
    "crimson", "gilded", "silent", "northern", "amber", "cobalt", "verdant",
    "hollow", "radiant", "umbral", "saffron", "arctic", "velvet", "obsidian",
    "ivory", "scarlet", "lunar", "solar", "misty", "ashen",
]
NOUNS = [
    "falcon", "harbor", "citadel", "meridian", "lantern", "orchard", "summit",
    "bastion", "garden", "foundry", "archive", "beacon", "junction", "prairie",
    "cascade", "terrace", "quarry", "atrium", "grove", "spire",
]
SUFFIXES = ["society", "institute", "collective", "consortium", "assembly", "union"]

FILLER = [
    "report", "update", "notes", "review", "story", "article", "weekly",
    "daily", "journal", "post", "memo", "brief", "digest", "bulletin",
]

LANGS = ["en", "en", "en", "fr", "es", "de", "zh"]  # en-weighted


@dataclass
class Fixture:
    pages: list[dict] = field(default_factory=list)
    mentions: list[dict] = field(default_factory=list)
    entities: list[dict] = field(default_factory=list)
    labeled_pairs: list[dict] = field(default_factory=list)
    expected_clusters: list[dict] = field(default_factory=list)


def _entity_titles(n: int, rng: np.random.RandomState) -> list[tuple[str, str | None]]:
    """n unique titles; every 10th entity is a near-dup PAIR ('… mark1' /
    '… mark2') that must not merge.  Returns (title, neardup_partner)."""
    titles: list[tuple[str, str | None]] = []
    combos = [(a, b, s) for a in ADJECTIVES for b in NOUNS for s in SUFFIXES]
    order = rng.permutation(len(combos))
    i = 0
    while len(titles) < n:
        a, b, s = combos[order[i % len(order)]]
        i += 1
        base = f"{a} {b} {s}"
        if any(t[0].startswith(base) for t in titles):
            continue
        if len(titles) % 10 == 8 and len(titles) + 2 <= n:
            titles.append((f"{base} mark1", f"{base} mark2"))
            titles.append((f"{base} mark2", f"{base} mark1"))
        else:
            titles.append((base, None))
    return titles[:n]


def _typo(s: str, rng: np.random.RandomState) -> str:
    """One char substitution at a seeded position ≥ 5 (keeps the prefix
    blocking key stable)."""
    if len(s) <= 6:
        return s
    pos = 5 + int(rng.randint(0, len(s) - 6))
    if s[pos] == " ":
        pos = min(pos + 1, len(s) - 1)
    repl = "abcdefghijklmnopqrstuvwxyz"[int(rng.randint(0, 26))]
    if repl == s[pos]:
        repl = "q" if s[pos] != "q" else "z"
    return s[:pos] + repl + s[pos + 1 :]


def _surface_variant(title: str, is_neardup: bool, rng: np.random.RandomState) -> str:
    """Seeded mention-surface noise.  Near-dup entities only get safe noise
    (case change) so the fixture never *requires* distinguishing a typo of
    'x mark1' from literal 'x mark2' on surface alone."""
    toks = title.split()
    roll = rng.rand()
    if is_neardup or roll < 0.55:
        if roll < 0.25:
            return title.upper() if rng.rand() < 0.5 else title.title()
        return title
    if roll < 0.75:
        return _typo(title, rng)
    if roll < 0.90 and len(toks) >= 2:
        toks2 = list(toks)
        toks2[0], toks2[-1] = toks2[-1], toks2[0]
        return " ".join(toks2)  # token swap alias
    if len(toks) >= 3:
        return " ".join(toks[:-1])  # dropped-suffix alias
    return title


def blocking_key_of(surface: str) -> str:
    """Shared blocking key for the F1 gate: first 4 chars of the
    token-sorted, lowercased surface (BASELINE 'same blocking key')."""
    return " ".join(sorted(surface.lower().split()))[:4]


def generate_fixture(
    num_pages: int = 500,
    num_entities: int = 100,
    seed: int = 42,
    hot_fraction: float = 0.2,
    num_hot: int = 3,
    max_labeled_per_key: int = 200,
) -> Fixture:
    """``max_labeled_per_key`` bounds the labeled-pair enumeration per
    blocking key (it is quadratic in key size — a hot key with 10^4
    mentions would otherwise emit 10^8 pairs in driver Python).  The cap
    takes the first N mentions per key in mention_id order, so the labeled
    sample stays deterministic.  Set to 0 to skip labeled pairs entirely
    (bench fixtures don't need them)."""
    rng = np.random.RandomState(seed)
    fx = Fixture()

    titles = _entity_titles(num_entities, rng)
    vocab = {}
    for i, (title, neardup) in enumerate(titles):
        eid = f"E{i:05d}"
        vocab[eid] = [f"term{i:03d}x{j:02d}" for j in range(20)]
        desc_words = [title] + list(rng.choice(vocab[eid], 30)) + list(
            rng.choice(FILLER, 5)
        )
        fx.entities.append(
            {
                "entity_id": eid,
                "title": title,
                "text": " ".join(desc_words),
            }
        )

    neardup_ids = {
        f"E{i:05d}" for i, (_, nd) in enumerate(titles) if nd is not None
    }
    eids = [e["entity_id"] for e in fx.entities]
    base_ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    mention_counter = 0
    for p in range(num_pages):
        n_mentions = 1 + int(rng.randint(0, 5))
        page_words: list[str] = list(rng.choice(FILLER, 3))
        page_mentions = []
        for _ in range(n_mentions):
            if rng.rand() < hot_fraction:
                eid = eids[int(rng.randint(0, num_hot))]
            else:
                eid = eids[int(rng.randint(0, len(eids)))]
            ent = fx.entities[int(eid[1:])]
            surface = _surface_variant(ent["title"], eid in neardup_ids, rng)

            left_ctx = list(rng.choice(vocab[eid], 6))
            right_ctx = list(rng.choice(vocab[eid], 6))
            page_words.extend(left_ctx)
            start = len(page_words)
            page_words.extend(surface.split())
            end = len(page_words) - 1
            page_words.extend(right_ctx)
            page_words.extend(rng.choice(FILLER, 2))

            mid = f"m{mention_counter:07d}"
            mention_counter += 1
            page_mentions.append(
                {
                    "mention_id": mid,
                    "entity_id": eid,
                    "surface": surface,
                    "start_index": start,
                    "end_index": end,
                    "category": "synthetic",
                }
            )

        if p % 17 == 0:
            page_words.append("a&b")  # exercises &amp; entity decoding

        text = " ".join(page_words)
        url = f"https://site{p % 25}.example/page/{p:06d}"
        lang = LANGS[int(rng.randint(0, len(LANGS)))]
        title_html = " ".join(page_words[:3])
        body_html = " ".join(page_words[3:])
        html = (
            "<html><head>"
            f"<title>{title_html.replace('&', '&amp;')}</title>"
            "<script>var tracking = 1;</script>"
            "<style>p { color: red; }</style>"
            "</head><body><div>  <p>"
            f"{body_html.replace('&', '&amp;')}"
            "</p>  </div></body></html>"
        )
        fx.pages.append(
            {
                "url": url,
                "warc_ts": base_ts + dt.timedelta(minutes=p),
                "html": bytearray(html.encode("utf-8")),
                "text": text,
                "lang": lang,
            }
        )
        for m in page_mentions:
            m["url"] = url
            m["corpus"] = f"site{p % 25}"
            fx.mentions.append(m)

    # Labeled pairs at shared blocking key (FIXTURES.md §4).
    by_key: dict[str, list[dict]] = {}
    if max_labeled_per_key > 0:
        for m in fx.mentions:
            by_key.setdefault(blocking_key_of(m["surface"]), []).append(m)
    for key, ms in sorted(by_key.items()):
        ms = sorted(ms, key=lambda m: m["mention_id"])[:max_labeled_per_key]
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                fx.labeled_pairs.append(
                    {
                        "mention_id_a": ms[i]["mention_id"],
                        "mention_id_b": ms[j]["mention_id"],
                        "blocking_key": key,
                        "is_match": ms[i]["entity_id"] == ms[j]["entity_id"],
                    }
                )

    # Golden clusters: min mention_id per entity (FIXTURES.md §5).
    by_ent: dict[str, list[str]] = {}
    for m in fx.mentions:
        by_ent.setdefault(m["entity_id"], []).append(m["mention_id"])
    for eid, mids in sorted(by_ent.items()):
        rep = min(mids)
        for mid in sorted(mids):
            fx.expected_clusters.append({"mention_id": mid, "cluster_id": rep})

    return fx


def zipfian_corpus(
    spark,
    n_docs: int = 5000,
    doc_len: int = 40,
    vocab_size: int = 50_000,
    zipf_a: float = 1.3,
    neardup_frac: float = 0.01,
    seed: int = 42,
):
    """(id, text) corpus with a ZIPFIAN vocabulary — natural-web-text
    token statistics, where rare tokens are actually rare.

    The sf* synthetic documents table has a tiny template vocabulary, so
    nearly every doc pair shares a token and the AllPairs/PPJoin prefix
    filter has no room to prune (dedup.py module docstring: 12.50M →
    11.32M).  On this corpus the filter's published sub-quadratic shape
    is MEASURABLE (scripts/prefix_filter_probe.py; VERDICT r03 #4).

    ``neardup_frac`` of docs are near-duplicates of an earlier doc
    (exactly one token swapped), so threshold-level matches exist.
    Deterministic under seed."""
    import numpy as np

    rng = np.random.RandomState(seed)
    # Zipf–Mandelbrot ranks via inverse-CDF sampling over a truncated
    # power law: P(rank r) ∝ 1/r^a
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** (-zipf_a)
    probs /= probs.sum()
    rows = []
    for i in range(n_docs):
        if i > 0 and rng.random_sample() < neardup_frac:
            src = rows[rng.randint(0, len(rows))][1].split(" ")
            src[rng.randint(0, len(src))] = f"w{int(rng.randint(0, vocab_size)):06d}"
            rows.append((i, " ".join(src)))
            continue
        toks = rng.choice(vocab_size, size=doc_len, p=probs)
        rows.append((i, " ".join(f"w{int(t):06d}" for t in toks)))
    return spark.createDataFrame(rows, "id long, text string")


def fixture_dataframes(spark, fx: Fixture):
    from entity_linking_spark.schemas import (
        ENTITY_SCHEMA,
        LABELED_PAIR_SCHEMA,
        PAGE_MENTION_SCHEMA,
        PAGES_SCHEMA,
    )

    pages = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in fx.pages],
        PAGES_SCHEMA,
    )
    mentions = spark.createDataFrame(
        [
            (
                m["mention_id"], m["url"], m["entity_id"], m["surface"],
                m["start_index"], m["end_index"], m["corpus"], m["category"],
            )
            for m in fx.mentions
        ],
        PAGE_MENTION_SCHEMA,
    )
    entities = spark.createDataFrame(
        [(e["entity_id"], e["title"], e["text"]) for e in fx.entities],
        ENTITY_SCHEMA,
    )
    labeled = spark.createDataFrame(
        [
            (lp["mention_id_a"], lp["mention_id_b"], lp["blocking_key"], lp["is_match"])
            for lp in fx.labeled_pairs
        ],
        LABELED_PAIR_SCHEMA,
    )
    return pages, mentions, entities, labeled
