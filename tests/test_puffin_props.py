"""Property-based fuzz of the Puffin/DV codec (operators/puffin.py):
arbitrary position sets round-trip bit-exactly through the full
container (write → footer → blob → positions), including run-heavy,
sparse, high-bucket, and empty shapes; random byte corruption anywhere
in a blob is always caught by the framing or CRC, never silently
decoded into different positions.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deimos_spark.operators.puffin import (
    PuffinError,
    deserialize_dv_vector,
    frame_dv_blob,
    read_dv_blob,
    read_footer,
    serialize_dv_vector,
    write_puffin_dvs,
)

positions = st.one_of(
    # dense runs (exercises roaring run containers)
    st.integers(0, 1 << 20).flatmap(
        lambda s: st.integers(1, 5000).map(lambda n: np.arange(s, s + n))
    ),
    # sparse random, multi-bucket (high 32 bits vary)
    st.lists(
        st.integers(0, (1 << 40) - 1), min_size=0, max_size=300
    ).map(lambda xs: np.asarray(sorted(set(xs)), dtype=np.int64)),
)


@given(positions)
@settings(max_examples=60, deadline=None)
def test_vector_roundtrip(idx):
    got = deserialize_dv_vector(serialize_dv_vector(idx))
    assert np.array_equal(got, np.unique(np.asarray(idx, dtype=np.int64)))


@given(st.lists(positions, min_size=1, max_size=4), st.randoms())
@settings(max_examples=25, deadline=None)
def test_container_roundtrip(tmp_path_factory, sets, rnd):
    p = str(tmp_path_factory.mktemp("puf") / "dv.puffin")
    dvs = {f"file:///d/f{i}.parquet": s for i, s in enumerate(sets)}
    metas = write_puffin_dvs(p, dvs)
    footer = read_footer(p)
    assert len(footer["blobs"]) == len(dvs)
    for ref, (off, size, card) in metas.items():
        got = read_dv_blob(p, off, size)
        want = np.unique(np.asarray(dvs[ref], dtype=np.int64))
        assert np.array_equal(got, want) and card == len(want)


@given(
    st.lists(st.integers(0, (1 << 38) - 1), min_size=1, max_size=50),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_corruption_never_silently_decodes(tmp_path_factory, xs, data):
    idx = np.asarray(sorted(set(xs)), dtype=np.int64)
    blob = frame_dv_blob(serialize_dv_vector(idx))
    pos = data.draw(st.integers(0, len(blob) - 1))
    bit = data.draw(st.integers(0, 7))
    mutated = bytearray(blob)
    mutated[pos] ^= 1 << bit
    p = str(tmp_path_factory.mktemp("puf") / "b.bin")
    open(p, "wb").write(bytes(mutated))
    try:
        got = read_dv_blob(p, 0, len(mutated))
    except PuffinError:
        return  # caught — the required outcome for any framing/CRC hit
    # decode "succeeded": only acceptable if it decoded to the SAME
    # positions (CRC collision is ~2^-32; a same-bytes no-op can't
    # happen since we flipped a bit)
    pytest.fail(
        f"corrupt blob decoded without error (pos={pos}, bit={bit}, "
        f"rows={len(got)})"
    )
