"""session memory-string parsing + heap-scaled broadcast threshold
(the r12s2 lowmem finding's fix must accept every suffix Spark's own
byteStringAs does — the raw string used to pass through verbatim)."""

from deimos_spark.session import _mem_to_bytes, broadcast_threshold_for_heap


def test_mem_suffixes_both_spellings():
    assert _mem_to_bytes("2g") == _mem_to_bytes("2gb") == 2 << 30
    assert _mem_to_bytes("8192mb") == _mem_to_bytes("8g")
    assert _mem_to_bytes("512m") == 512 << 20
    assert _mem_to_bytes("8b") == 8
    # suffixless follows Spark's byteStringAsMb: bare numbers are MiB
    assert _mem_to_bytes("4096") == 4 << 30


def test_broadcast_threshold_scales_with_heap():
    assert broadcast_threshold_for_heap("8g") == 32 << 20   # capped
    assert broadcast_threshold_for_heap("2gb") == 32 << 20
    assert broadcast_threshold_for_heap("1g") == 16 << 20   # heap/64
    assert broadcast_threshold_for_heap("512m") == 10 << 20  # floor
