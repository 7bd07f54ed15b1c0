"""Losslessness of the prefix-filter candidate generation, checked on
an ADVERSARIAL synthetic corpus (not the friendly fixture): many
near-identical templates, full duplicates, containment chains (doc ⊂
doc ⊂ doc), hot boilerplate shingles shared by everything, and tiny
docs below the shingle width. The prefix/length filters of
q_dedup_jaccard_prefix and q_dedup_containment are provably lossless;
these tests check the implementation against brute-force set math on a
corpus built to break them."""

from __future__ import annotations

import itertools
import os
import random
import tempfile

import pytest

from kafka_to_parquet_spark import registry


WORDS = [f"w{i}" for i in range(120)]


def _mk_corpus() -> list[tuple[int, str]]:
    rng = random.Random(20260814)
    docs: list[tuple[int, str]] = []
    did = itertools.count()
    # hot boilerplate prefix shared by many docs (stress the df-ordered
    # canonical prefix: hot shingles must not blow up candidates or get
    # wrongly excluded)
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    for _ in range(12):
        body = " ".join(rng.choices(WORDS, k=rng.randint(8, 30)))
        docs.append((next(did), f"{boiler} {body}"))
    # exact duplicates
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for _ in range(3):
        docs.append((next(did), dup))
    # containment chain: d1 ⊂ d2 ⊂ d3
    base = " ".join(WORDS[10:30])
    docs.append((next(did), base))
    docs.append((next(did), base + " " + " ".join(WORDS[40:46])))
    docs.append((next(did), base + " " + " ".join(WORDS[40:60])))
    # near-duplicates: one-word edits of a template
    tmpl = " ".join(WORDS[60:80])
    for i in range(5):
        toks = tmpl.split()
        toks[i * 3 % len(toks)] = f"edit{i}"
        docs.append((next(did), " ".join(toks)))
    # tiny docs (below shingle width) and empty-ish docs
    docs.append((next(did), "one two"))
    docs.append((next(did), "solo"))
    # random background
    for _ in range(30):
        docs.append((next(did), " ".join(rng.choices(WORDS, k=rng.randint(5, 40)))))
    return docs


@pytest.fixture(scope="module")
def adversarial_dir(spark):
    d = tempfile.mkdtemp(prefix="ktps_adv_")
    rows = [(i, t, "xx", "synthetic", len(t)) for (i, t) in _mk_corpus()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    yield d
    from kafka_to_parquet_spark.cache import clear_caches

    clear_caches(spark, d)


def _hashed_sets(spark, sf_dir):
    from kafka_to_parquet_spark.llm.minhash import _hashed_shingles

    return {
        r.doc_id: frozenset(r.hs)
        for r in _hashed_shingles(spark, sf_dir).collect()
    }


def test_jaccard_prefix_is_lossless_on_adversarial_corpus(spark, adversarial_dir):
    registry.load_all()
    sets = _hashed_sets(spark, adversarial_dir)
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= 0.5:
            want.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["q_dedup_jaccard_prefix"](
            spark, adversarial_dir
        ).collect()
    }
    assert got == want


def test_containment_is_lossless_on_adversarial_corpus(spark, adversarial_dir):
    registry.load_all()
    sets = _hashed_sets(spark, adversarial_dir)
    want = set()
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter * 5 >= len(sets[a]) * 4:
                want.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["q_dedup_containment"](
            spark, adversarial_dir
        ).collect()
    }
    assert got == want
    # the containment chain must be fully detected, including the
    # transitive (smallest ⊂ largest) pair
    chain = [
        i for (i, t) in _mk_corpus() if t.startswith(" ".join(WORDS[10:12]) + " ")
    ]
    for small, large in itertools.combinations(chain, 2):
        assert (small, large) in got


def test_ppjoin_shard_mode_materializes_parquet_not_persist(
    spark, adversarial_dir, monkeypatch
):
    """In shard mode the posting tables must land as compressed
    parquet temp datasets, staged intermediate removed, path cached
    for reuse — and the deserialized single-pass persists must NOT be
    populated (their block-manager spill was what pushed the sf≈100
    cell over the disk; see _sharded_ppjoin docstring)."""
    import glob as _glob
    import os as _os

    from kafka_to_parquet_spark.cache import clear_caches
    from kafka_to_parquet_spark.llm.minhash import _POSTINGS_CACHE

    registry.load_all()
    clear_caches(spark, adversarial_dir)
    monkeypatch.setenv("KTPS_PPJOIN_SHARDS", "3")
    registry.QUERIES["q_dedup_jaccard_prefix"](spark, adversarial_dir).collect()
    inner = _POSTINGS_CACHE[(spark, adversarial_dir)]
    assert all(k.startswith("parquet:") for k in inner), sorted(inner)
    (pq,) = [k for k in inner if k.startswith("parquet:prefix:")]
    path = inner[pq]
    assert _glob.glob(_os.path.join(path, "*.parquet"))
    assert not _os.path.exists(path + ".stage1")
    # second run reuses the materialized dataset (same cached path)
    registry.QUERIES["q_dedup_jaccard_prefix"](spark, adversarial_dir).collect()
    assert _POSTINGS_CACHE[(spark, adversarial_dir)][pq] == path
    # eviction must FREE the on-disk dataset, not just drop the path
    # string — orphaned tempdirs compounded per re-materialization on
    # the disk-bound stress box (round-12 advisor item 1).
    clear_caches(spark, adversarial_dir)
    assert not _os.path.exists(path)


@pytest.mark.parametrize(
    "qname,keycols",
    [
        ("q_dedup_jaccard_prefix", ("doc_a", "doc_b", "jaccard")),
        ("q_dedup_containment", ("doc_a", "doc_b", "containment")),
    ],
)
def test_ppjoin_shard_knob_is_lossless(
    spark, adversarial_dir, monkeypatch, qname, keycols
):
    """KTPS_PPJOIN_SHARDS partitions the candidate join by token-
    universe shard (the sf≈100 spill-bound mitigation, round-11
    verdict item 3); sharding must change ONLY the execution shape —
    the verified pair set and similarity values are identical for any
    S, including S larger than the number of distinct hashes hit."""
    registry.load_all()

    def rows(df):
        return sorted(tuple(r[c] for c in keycols) for r in df.collect())

    monkeypatch.delenv("KTPS_PPJOIN_SHARDS", raising=False)
    base = rows(registry.QUERIES[qname](spark, adversarial_dir))
    assert base  # the adversarial corpus produces pairs by design
    for shards in (3, 7):
        monkeypatch.setenv("KTPS_PPJOIN_SHARDS", str(shards))
        assert rows(registry.QUERIES[qname](spark, adversarial_dir)) == base


def test_ppjoin_shards_self_select(spark, adversarial_dir, monkeypatch):
    """Round-12 verdict item 2: with NO env var set the shard count
    derives from the measured posting count (ceil(postings/target),
    clamped), so the third-decade corpus runs off-cliff by default;
    $KTPS_PPJOIN_SHARDS still pins a regime for stress-control cells;
    and the auto-selected plan returns the same verified rows."""
    from kafka_to_parquet_spark.cache import clear_caches
    from kafka_to_parquet_spark.llm import minhash

    registry.load_all()
    monkeypatch.delenv("KTPS_PPJOIN_SHARDS", raising=False)
    monkeypatch.delenv("KTPS_PPJOIN_TARGET_POSTINGS", raising=False)
    n_post = minhash._posting_count(spark, adversarial_dir)
    assert n_post > 0
    # tiny corpus, default budget: single-pass
    assert minhash.ppjoin_shards(spark, adversarial_dir) == 1
    # pinned env wins over auto-selection
    monkeypatch.setenv("KTPS_PPJOIN_SHARDS", "5")
    assert minhash.ppjoin_shards(spark, adversarial_dir) == 5
    monkeypatch.delenv("KTPS_PPJOIN_SHARDS", raising=False)
    # shrink the per-pass budget so THIS corpus crosses it: exact ceil
    target = max(1, n_post // 3)
    monkeypatch.setenv("KTPS_PPJOIN_TARGET_POSTINGS", str(target))
    want = min(64, -(-n_post // target))
    assert minhash.ppjoin_shards(spark, adversarial_dir) == want
    assert want > 1
    # the auto-sharded plan is lossless vs the single-pass result
    def rows(df):
        return sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in df.collect()
        )

    auto = rows(registry.QUERIES["q_dedup_jaccard_prefix"](spark, adversarial_dir))
    monkeypatch.delenv("KTPS_PPJOIN_TARGET_POSTINGS", raising=False)
    clear_caches(spark, adversarial_dir)
    single = rows(
        registry.QUERIES["q_dedup_jaccard_prefix"](spark, adversarial_dir)
    )
    assert auto == single and auto


def test_containment_count_filter_at_exact_threshold(spark):
    """Round-14 counting form of the containment prefix filter: a
    candidate pair must share >= min(K, ceil(tau*|a|)) of a's
    (K-1)-extended canonical prefix. The bound is TIGHT exactly when
    a's missing shingles are its globally rarest — they monopolize the
    df-ordered prefix and leave only p - m shared slots — so this
    corpus makes every edit word unique (df=1 shingles, guaranteed
    rarest class) and sweeps edit counts so true pairs land ON the
    overlap = ceil(tau*|a|) boundary. Brute-force set math is the
    truth; at least one true pair must sit within 1 of the boundary or
    the corpus stopped exercising it."""
    import itertools as _it
    import os as _os
    import tempfile as _tempfile

    from kafka_to_parquet_spark.cache import clear_caches

    registry.load_all()
    docs = []
    did = _it.count()
    # trial t: container b = L unique words (+ tail growth); contained
    # a = b's first L words with d interior words swapped for unique
    # edit tokens. Each swapped word kills up to 3 of a's shingles, so
    # sweeping (L, d) brackets the 4/5 threshold from both sides.
    for L in (18, 22, 25, 28, 33, 40):
        for d in (0, 1, 2, 3):
            t = len(docs)
            base = [f"t{t}w{i}" for i in range(L)]
            b_words = base + [f"t{t}x{i}" for i in range(4)]
            a_words = list(base)
            for j in range(d):
                a_words[3 + 5 * j] = f"t{t}e{j}"
            docs.append((next(did), " ".join(a_words)))
            docs.append((next(did), " ".join(b_words)))
    d = _tempfile.mkdtemp(prefix="ktps_cnt_thr_")
    rows = [(i, txt, "xx", "synthetic", len(txt)) for (i, txt) in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(_os.path.join(d, "documents.parquet"))
    try:
        sets = _hashed_sets(spark, d)
        want, margins = set(), []
        for a in sets:
            for b in sets:
                if a == b:
                    continue
                inter = len(sets[a] & sets[b])
                ceil_t = (4 * len(sets[a]) + 4) // 5
                if inter * 5 >= len(sets[a]) * 4:
                    want.add((a, b))
                    margins.append(inter - ceil_t)
        got = {
            (r.doc_a, r.doc_b)
            for r in registry.QUERIES["q_dedup_containment"](spark, d).collect()
        }
        assert got == want
        assert want, "corpus produced no containment pairs"
        # the boundary is actually exercised: some true pair sits at
        # (or within 1 shingle of) overlap == ceil(tau*|a|)
        assert min(margins) <= 1, sorted(margins)[:5]
    finally:
        clear_caches(spark, d)
