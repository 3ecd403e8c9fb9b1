"""simhash_portable_pairs: the chunk-blocked plan must equal brute force
on NEAR duplicates (hamming 1..3), not just the exact copies (hamming 0)
the driver data guarantees.

The registered oracle is already a brute-force O(n²) scan, so the driver
check proves blocking-completeness on whatever pairs the corpus holds —
but synthetic sf docs are mutually distant, so only the constructed exact
copies match there. This suite builds documents whose token sets differ
by 1-3 tokens out of 60 (signatures land within a few bits) and checks
the REGISTERED query's output against an independent pure-Python SimHash
(hashlib md5, no Spark/DuckDB expressions) — a third implementation, so a
shared expression bug can't self-confirm.
"""

from __future__ import annotations

import hashlib
import itertools

import pytest

from mapreducefw_spark.queries import QUERIES, load_all

load_all()

BITS = 48


def _h48(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:12], 16)


def _sig(text: str) -> int | None:
    toks = sorted({t for t in text.split(" ") if t})
    if not toks:
        return None
    hs = [_h48(t) for t in toks]
    n = len(hs)
    sig = 0
    for b in range(BITS):
        if sum((h >> b) & 1 for h in hs) * 2 > n:
            sig |= 1 << b
    return sig


def _brute_pairs(rows):
    sigs = {}
    for doc_id, text in rows:
        if text is None:
            continue
        s = _sig(text)
        if s is not None:
            sigs[doc_id] = s
    out = []
    for a, b in itertools.combinations(sorted(sigs), 2):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= 3:
            out.append((a, b, ham))
    return sorted(out)


@pytest.fixture(scope="module")
def near_dup_dir(spark, tmp_path_factory):
    base = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, base, "en", "s0", len(base)),
        # 1-token substitutions at different positions -> small hamming
        (2, base.replace("tok7", "zzz7"), "en", "s0", len(base)),
        (3, base.replace("tok31", "qqq"), "en", "s1", len(base)),
        # 2-token change
        (4, base.replace("tok7", "zzz7").replace("tok31", "qqq"), "en", "s1", len(base)),
        # unrelated doc -> far signature
        (5, " ".join(f"other{i}" for i in range(60)), "de", "s2", 100),
        # exact duplicate of 1
        (6, base, "en", "s2", len(base)),
        (7, None, "en", "s2", 0),  # NULL text: excluded
        (8, "", "en", "s2", 0),  # zero tokens: excluded
    ]
    d = tmp_path_factory.mktemp("simhash_near")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d), rows


def test_blocked_pairs_equal_pure_python_brute_force(spark, near_dup_dir):
    sf_dir, rows = near_dup_dir
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["simhash_portable_pairs"](spark, sf_dir).collect()
    )
    # the registered query unions exact copies of doc_id % 10 == 0; none
    # of the fixture ids are, so the corpus is exactly `rows`
    want = _brute_pairs([(i, t) for i, t, *_ in rows])
    assert got == want
    # the fixture must actually exercise NEAR duplicates, not only exact
    # copies — at least one pair at each of hamming 0 and 1..3
    hams = {h for _, _, h in want}
    assert 0 in hams and any(h > 0 for h in hams)


def test_capped_equals_uncapped_when_cap_unbound(spark, near_dup_dir):
    """The cap_bucket_size escape hatch (r8 verdict order #4) must be a
    pure safety valve: on a corpus where no chunk bucket exceeds the cap,
    the capped production form returns EXACTLY the uncapped (lossless-
    blocking-proof) form's pairs."""
    from mapreducefw_spark.queries.pipeline26 import portable_simhash_pairs_frame

    sf_dir, _rows = near_dup_dir
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    uncapped = sorted(map(tuple, portable_simhash_pairs_frame(corpus).collect()))
    capped = sorted(
        map(tuple, portable_simhash_pairs_frame(corpus, max_bucket_size=64).collect())
    )
    assert capped == uncapped
    assert len(uncapped) > 0


def test_cap_drops_mass_duplicate_bucket_pairs(spark):
    """On a boilerplate-heavy corpus (300 exact copies of one template)
    the cap must actually bind: the mega-bucket's quadratic pair set is
    dropped while pairs among distinct non-template docs survive."""
    from mapreducefw_spark.queries.pipeline26 import portable_simhash_pairs_frame

    template = " ".join(f"boiler{i}" for i in range(40))
    base = " ".join(f"tok{i}" for i in range(60))
    rows = [(i, template) for i in range(300)]
    # 1001 is an exact copy of 1000 (hamming 0 — a guaranteed near-dup
    # pair whose 4 chunk buckets hold exactly 2 docs, far under the cap)
    rows += [(1000, base), (1001, base), (1002, " ".join(f"far{i}" for i in range(50)))]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    capped = sorted(
        map(tuple, portable_simhash_pairs_frame(corpus, max_bucket_size=64).collect())
    )
    # the 300-copy template bucket (300*299/2 = 44850 pairs) is dropped;
    # the near-dup pair of real docs is kept (its buckets hold 2 docs)
    assert (1000, 1001) in {(a, b) for a, b, _ in capped}
    assert all(a >= 1000 for a, _, _ in capped), capped[:5]
