"""Arrow-batched pandas-UDF kernel factories.

This module deliberately has NO `from __future__ import annotations`: the
pandas_udf decorator infers the eval type from *real* type-hint objects
(pd.Series/pd.DataFrame), and stringified annotations would defeat that
inference, forcing the deprecated PandasUDFType enum. Keeping every kernel
here lets the rest of the package use future-annotations freely.

All factories capture their schema/model arguments at plan time so
executors never call back into driver-side objects.
"""

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def pyavro_encode_udf(raw_schema):
    """JSON strings → binary-Avro bytes (see codecs.PyAvroCodec)."""
    import json as _json

    def _enc(js: pd.Series) -> pd.Series:
        from deimos_spark.schemas.pyavro import encode_record, json_to_avro_dict

        out = []
        for s in js:
            if s is None:
                out.append(None)
            else:
                payload = json_to_avro_dict(raw_schema, _json.loads(s))
                out.append(encode_record(raw_schema, payload))
        return pd.Series(out, dtype=object)

    return pandas_udf(_enc, T.BinaryType())


def pyavro_decode_udf(raw_schema, names, out_struct):
    """Binary-Avro bytes → struct rows (all-None for NULL input; the
    caller's when() restores NULL structs)."""

    def _dec(bs: pd.Series) -> pd.DataFrame:
        from deimos_spark.schemas.pyavro import decode_record

        rows = []
        for b in bs:
            if b is None:
                rows.append({n: None for n in names})
            else:
                rows.append(decode_record(raw_schema, bytes(b)))
        return pd.DataFrame(rows, columns=list(names))

    return pandas_udf(_dec, out_struct)


def registry_decode_udf(writers, reader_raw, names, out_struct):
    """Confluent-framed bytes → struct rows with per-message writer-schema
    dispatch + Avro schema resolution against the reader."""

    def _dec(bs: pd.Series) -> pd.DataFrame:
        from deimos_spark.schemas.pyavro import decode_record

        rows = []
        for b in bs:
            if b is None:
                rows.append({n: None for n in names})
                continue
            b = bytes(b)
            if len(b) < 5 or b[0] != 0:
                raise ValueError("message lacks Confluent wire framing")
            sid = int.from_bytes(b[1:5], "big")
            writer = writers.get(sid)
            if writer is None:
                raise ValueError(
                    f"unknown schema id {sid} for subject (known: {sorted(writers)})"
                )
            rows.append(decode_record(writer, b[5:], reader_schema=reader_raw))
        return pd.DataFrame(rows, columns=list(names))

    return pandas_udf(_dec, out_struct)


def proto_encode_udf(message):
    """JSON strings → proto3 wire bytes (see codecs.ProtoCodec)."""
    import json as _json

    def _enc(js: pd.Series) -> pd.Series:
        from deimos_spark.schemas.protowire import encode_message, json_to_proto_dict

        out = []
        for s in js:
            if s is None:
                out.append(None)
            else:
                payload = json_to_proto_dict(message, _json.loads(s))
                out.append(encode_message(message, payload))
        return pd.Series(out, dtype=object)

    return pandas_udf(_enc, T.BinaryType())


def proto_decode_udf(message, names, out_struct):
    """proto3 wire bytes → struct rows."""

    def _dec(bs: pd.Series) -> pd.DataFrame:
        from deimos_spark.schemas.protowire import decode_message

        rows = []
        for b in bs:
            if b is None:
                rows.append({n: None for n in names})
            else:
                rows.append(decode_message(message, bytes(b)))
        return pd.DataFrame(rows, columns=list(names))

    return pandas_udf(_dec, out_struct)


def ivf_cell_udf(centroids):
    """embedding array → nearest-centroid index, one BLAS matmul per Arrow
    batch (see simsearch.ivf_assign)."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    c_norm2 = (cents**2).sum(axis=1)

    def _cell(v: pd.Series) -> pd.Series:
        m = np.vstack(v.to_numpy()).astype(np.float64)
        # argmin ||x-c||² = argmin (||c||² - 2·x·c); ||x||² is constant per row
        d = c_norm2[None, :] - 2.0 * (m @ cents.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return pandas_udf(_cell, "int")


def ivf_cell_dist_udf(centroids):
    """embedding array → struct(cell, dist): nearest-centroid index plus
    the GEODESIC angle (radians) to the assigned centroid's unit
    direction — the per-row half of the metric-ball blocking in
    simsearch.pairwise_cosine_exact_blocked (cell radii = max member
    angle). Angles, not chords: the spherical triangle inequality on
    geodesics is strictly tighter than the chord-space one (at
    threshold 0.4 the chord radius sqrt(2−2t)=1.095 ≈ the typical
    inter-centroid chord, pruning nothing).

    Rows are unit-normalized inside the kernel. Zero-norm and NULL
    embeddings report angle 0 — deliberately NOT inflating the cell's
    radius: such rows can never satisfy a positive cosine threshold
    (the confirm-stage cosine is NULL/0), so the bound need not cover
    them. One BLAS matmul per Arrow batch."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    c_norm2 = (cents**2).sum(axis=1)
    cn = np.sqrt(c_norm2)
    cunit = np.divide(
        cents, cn[:, None], out=np.zeros_like(cents), where=cn[:, None] > 0
    )
    dim = cents.shape[1]

    def _cell_dist(v: pd.Series) -> pd.DataFrame:
        m = np.vstack(
            [
                np.zeros(dim) if x is None else np.asarray(x, dtype=np.float64)
                for x in v.to_numpy()
            ]
        )
        nrm = np.sqrt((m * m).sum(axis=1, keepdims=True))
        nonzero = (nrm > 0).ravel()
        m = np.divide(m, nrm, out=np.zeros_like(m), where=nrm > 0)
        x2 = (m * m).sum(axis=1)
        d2 = x2[:, None] + c_norm2[None, :] - 2.0 * (m @ cents.T)
        np.maximum(d2, 0.0, out=d2)
        cell = d2.argmin(axis=1)
        cosang = np.clip(
            (m * cunit[cell]).sum(axis=1), -1.0, 1.0
        )
        ang = np.where(nonzero, np.arccos(cosang), 0.0)
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "dist": ang}
        )

    return pandas_udf(_cell_dist, "cell int, dist double")


def proto_registry_decode_udf(message, names, out_struct, known_ids=None):
    """Confluent-Protobuf-framed bytes → struct rows: validates magic 0
    + 4-byte BE schema id (optionally against the subject's known ids),
    parses the zigzag-varint message-indexes array ([0] encodes as one
    0x00 byte), then decodes the proto3 body with the READER schema —
    typed errors for any malformed frame, mirroring registry_decode_udf.
    """
    ids = frozenset(known_ids) if known_ids else None

    def _zz_varint(b, pos):
        shift, acc = 0, 0
        while True:
            if pos >= len(b):
                raise ValueError("truncated message-index varint")
            x = b[pos]
            pos += 1
            acc |= (x & 0x7F) << shift
            if not x & 0x80:
                return (acc >> 1) ^ -(acc & 1), pos
            shift += 7
            if shift > 63:
                raise ValueError("runaway message-index varint")

    def _dec(bs: pd.Series) -> pd.DataFrame:
        from deimos_spark.schemas.protowire import decode_message

        rows = []
        for b in bs:
            if b is None:
                rows.append({n: None for n in names})
                continue
            b = bytes(b)
            if len(b) < 6 or b[0] != 0:
                raise ValueError(
                    "message lacks Confluent Protobuf wire framing"
                )
            sid = int.from_bytes(b[1:5], "big")
            if ids is not None and sid not in ids:
                raise ValueError(
                    f"unknown schema id {sid} for subject "
                    f"(known: {sorted(ids)})"
                )
            count, pos = _zz_varint(b, 5)
            if count < 0 or count > 128:
                raise ValueError(f"absurd message-index count {count}")
            for _ in range(count):
                _, pos = _zz_varint(b, pos)
            rows.append(decode_message(message, b[pos:]))
        return pd.DataFrame(rows, columns=list(names))

    return pandas_udf(_dec, out_struct)
