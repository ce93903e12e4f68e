"""Token-window chunking (operators/chunking.py): boundary semantics
gated against an independently-written pure-Python reference."""

import re

import pytest

from deimos_spark.operators.chunking import chunk_documents


def _engine_tokens(text):
    """The engine's tokenizer convention exactly: trim strips SPACES
    only, Java split keeps a leading empty token but drops trailing
    ones."""
    import re

    parts = re.split(r"\s+", text.strip(" "))
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _py_chunks(text, chunk_size, overlap):
    if not re.search(r"\S", text):
        return []
    toks = _engine_tokens(text)
    out = []
    stride = chunk_size - overlap
    start = 0
    idx = 0
    while start < len(toks):
        if start > 0 and start + overlap >= len(toks):
            break  # pure suffix-duplicate of the previous chunk
        piece = toks[start : start + chunk_size]
        out.append((idx, len(piece), " ".join(piece)))
        idx += 1
        start += stride
    return out


CASES = [
    "one two three four five six seven eight nine ten",
    "single",
    "  leading and trailing   whitespace\ttabs\nnewlines  ",
    "exactly four tokens here",
    "\ttab-led text keeps the leading empty token",
    " ".join(f"w{i}" for i in range(200)),
]


@pytest.mark.parametrize("chunk_size,overlap", [(4, 0), (4, 1), (8, 3)])
def test_matches_python_reference(spark, chunk_size, overlap):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    got = {}
    rows = chunk_documents(
        df, id_cols=("doc_id",), chunk_size=chunk_size, overlap=overlap
    ).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        )
    for i, t in enumerate(CASES):
        want = _py_chunks(t, chunk_size, overlap)
        assert sorted(got.get(i, [])) == want, f"doc {i}"


def test_empty_and_whitespace_docs_produce_no_chunks(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   \t\n "), (2, "real text")],
        "doc_id long, text string",
    )
    rows = chunk_documents(
        df, id_cols=("doc_id",), chunk_size=4, overlap=1
    ).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_overlap_is_shared_suffix_prefix(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(
            df, id_cols=("doc_id",), chunk_size=4, overlap=2
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    texts = [r["chunk_text"] for r in rows]
    # start 6 would yield "g h" — a pure suffix-duplicate of chunk 2's
    # overlap region — and is filtered
    assert texts == ["a b c d", "c d e f", "e f g h"]
    for a, b in zip(texts, texts[1:]):
        assert a.split()[-2:] == b.split()[:2] or len(b.split()) < 2


def test_bad_overlap_refuses():
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(None, chunk_size=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(None, chunk_size=4, overlap=-1)


# ------------------------------------------------- exact_segment_dedup

def test_exact_segment_dedup_drops_shared_segments(spark):
    from hashlib import md5

    from deimos_spark.operators.chunking import exact_segment_dedup

    boiler = "subscribe to our newsletter now"  # 5 tokens
    docs = [
        (0, f"{boiler} alpha beta gamma delta epsilon"),
        (1, f"{boiler} one two three four five"),
        (2, "totally unique content with no duplication at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in exact_segment_dedup(
            df, segment_size=5, min_docs=2
        ).collect()
    }
    # docs 0 and 1 share their first 5-token segment exactly
    for i in (0, 1):
        assert got[i]["n_segs"] == 2
        assert got[i]["n_dropped"] == 1
        assert got[i]["kept_tokens"] == 5
    assert got[2]["n_dropped"] == 0
    assert got[2]["kept_tokens"] == 8
    # cleaned text = the surviving segment, verified against plain md5
    assert got[0]["clean_md5"] == md5(
        b"alpha beta gamma delta epsilon"
    ).hexdigest()


def test_exact_segment_dedup_all_dropped_doc(spark):
    from hashlib import md5

    from deimos_spark.operators.chunking import exact_segment_dedup

    same = "exact copy of a tiny doc"
    df = spark.createDataFrame(
        [(0, same), (1, same)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in exact_segment_dedup(
            df, segment_size=8, min_docs=2
        ).collect()
    }
    for i in (0, 1):
        assert got[i]["n_dropped"] == got[i]["n_segs"] == 1
        assert got[i]["kept_tokens"] == 0
        assert got[i]["clean_md5"] == md5(b"").hexdigest()
