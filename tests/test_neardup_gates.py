"""Correctness gates for the two near-dup queries that previously had
zero answer verification (VERDICT r6 #2): t07 simhash pairs and t08
embedding near-dup. Both are `no_oracle` rows-only for the driver
(xxhash64 seeds / LSH recall aren't ANSI-SQL-expressible), so these
tests are the only place a sign-flip in the simhash bit-aggregation, a
broken pigeonhole bucketing, or a degenerate LSH join would surface.

Style follows tests/test_approx_tolerance.py: the gates run the DECLARED
registry code paths (dedup.simhash_near_pairs /
simsearch.pairwise_cosine_above), not private reimplementations, against
references computed independently inside the test.
"""

import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from deimos_spark.operators import dedup, simsearch


# --------------------------------------------------------------- t07 simhash

def _ref_fingerprint(tokens, token_hash):
    """Pure-Python SimHash reference: per-bit ±1 sums over each token's
    64-bit hash, sign-packed into a signed long. Python's arithmetic >>
    on (possibly negative) ints matches Spark's shiftright on LONG, so
    bit extraction is identical by construction."""
    sums = [0] * 64
    for t in tokens:
        hv = token_hash[t]
        for i in range(64):
            sums[i] += 1 if ((hv >> i) & 1) == 1 else -1
    v = 0
    for i in range(64):
        if sums[i] > 0:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64  # two's-complement: bit 63 is the long sign bit
    return v


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def simhash_corpus(spark):
    """Seeded corpus with designed structure: an exact duplicate pair, a
    one-token-swap pair, a three-token-swap pair, and unrelated docs.
    With seed 7 the reference hammings are 0 (1-2), 1 (1-3, 2-3),
    4 (3-4), 5 (1-4, 2-4), >12 otherwise — pairs on BOTH sides of the
    max_hamming=3 line, so the gate detects over- and under-reporting."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    base = rng.sample(vocab, 40)
    docs = {
        1: list(base),
        2: list(base),
        3: base[:-1] + ["w199"],
        4: base[:-3] + ["w190", "w191", "w192"],
        5: rng.sample(vocab, 40),
        6: rng.sample(vocab, 40),
        7: base[:20] + rng.sample(vocab, 20),
    }
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    # token -> xxhash64: the hash primitive comes from the JVM (it's the
    # same primitive under test and reference either way); everything
    # downstream — bit sums, sign pack, hamming, pair enumeration — is
    # recomputed in pure Python here.
    toks = sorted({t for ts in docs.values() for t in ts})
    token_hash = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    }
    return docs, df, token_hash


def test_simhash_fingerprints_match_pure_python_reference(simhash_corpus):
    docs, df, token_hash = simhash_corpus
    ref = {i: _ref_fingerprint(t, token_hash) for i, t in docs.items()}
    got = {
        r["doc_id"]: r["_sh"]
        for r in dedup.simhash_fingerprints(df).collect()
    }
    assert got == ref


def test_simhash_near_pairs_exact_vs_reference(simhash_corpus):
    """The pigeonhole candidate generation (4×16-bit chunks) is COMPLETE
    for hamming ≤ 3, so the declared query must return exactly the
    reference pair set — not a recall bound, set equality."""
    docs, df, token_hash = simhash_corpus
    ref = {i: _ref_fingerprint(t, token_hash) for i, t in docs.items()}
    expected = {
        (a, b): _hamming(ref[a], ref[b])
        for a, b in itertools.combinations(sorted(docs), 2)
        if _hamming(ref[a], ref[b]) <= 3
    }
    # fixture sanity: pairs exist strictly inside AND outside the line
    assert any(h == 0 for h in expected.values())
    assert any(0 < h <= 3 for h in expected.values())
    assert len(expected) < len(docs) * (len(docs) - 1) // 2

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(df).collect()
    }
    assert got == expected


def test_simhash_near_pairs_collapse_exact_mode(simhash_corpus):
    """collapse_exact=True folds byte-identical docs into one
    representative: the (1,2) hamming-0 pair disappears, the surviving
    representative keeps its near-pairs."""
    docs, df, token_hash = simhash_corpus
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(df, collapse_exact=True).collect()
    }
    assert (1, 2) not in got
    rep_pairs = {p for p in got if p[1] == 3 or p[0] == 3}
    assert len(rep_pairs) == 1  # exactly one of docs 1/2 survived
    assert all(h == 1 for p, h in got.items() if p in rep_pairs)


# ------------------------------------------------- t08 embedding near-dup

@pytest.fixture(scope="module")
def planted_embeddings(spark):
    """Seeded 64-dim embeddings with 20 planted near-identical pairs
    (tiny perturbation → cosine ≥ 0.999) among 200 random background
    vectors (random 64-dim pairs have |cos| ≈ 0.12 — far below the 0.9
    threshold). Deterministic: numpy seed fixed, LSH planes seeded."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    planted = []
    for _ in range(20):
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        w = v + 0.01 * rng.standard_normal(64)
        w /= np.linalg.norm(w)
        rows.append((vid, [float(x) for x in v]))
        rows.append((vid + 1, [float(x) for x in w]))
        planted.append((vid, vid + 1))
        vid += 2
    for _ in range(200):
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, set(planted)


def test_embedding_neardup_recall_and_sims_vs_exact(planted_embeddings):
    """t08's LSH-bucketed pairwise_cosine_above vs the guarded exact
    baseline (t09's pairwise_cosine_exact): every returned pair must
    appear in the exact result WITH the identical similarity (the sim
    filter is exact cosine — LSH only prunes candidates, never invents
    them), and recall over the exact pair set must clear 0.8."""
    df, planted = planted_embeddings
    threshold = 0.9
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in simsearch.pairwise_cosine_exact(df, threshold).collect()
    }
    # fixture sanity: the exact baseline finds every planted pair
    assert planted <= set(exact)

    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in simsearch.pairwise_cosine_above(
            df, threshold, n_planes=6
        ).collect()
    }
    # precision: subset of exact, byte-identical sims
    assert set(got) <= set(exact)
    for p, s in got.items():
        assert s == exact[p], (p, s, exact[p])
    # recall (deterministic at these seeds)
    recall = len(got) / len(exact)
    assert recall >= 0.8, (recall, len(got), len(exact))


def test_embedding_neardup_declared_query_subset_of_exact(spark):
    """The DECLARED t08 registry query on the real sf0.001 embeddings
    table: its pairs must be a subset of the exact all-pairs answer at
    the same threshold with identical sims. (Recall at threshold 0.4 is
    intentionally un-gated here — sim-0.4 pairs agree on 6 planes with
    low probability; the planted-pair test above gates recall where LSH
    is designed to operate.)"""
    from deimos_spark.queries import all_queries

    q = all_queries()["t08_embedding_neardup"].builder
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in q(spark, "/root/testdata/sf0.001").collect()
    }
    from deimos_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in simsearch.pairwise_cosine_exact(emb, 0.4).collect()
    }
    assert set(got) <= set(exact)
    for p, s in got.items():
        assert s == exact[p]
