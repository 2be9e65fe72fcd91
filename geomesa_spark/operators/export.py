"""Export formats + geometric aggregates.

- BIN format: the reference's compact viz encoding — 16-byte records
  (trackId:int32, dtg-seconds:int32, lat:float32, lon:float32), 24-byte
  when a label is attached (/root/reference/geomesa-index-api/src/main/
  scala/org/locationtech/geomesa/index/iterators/BinAggregatingScan.scala:
  31-55; record layout geomesa-utils/.../bin/BinaryOutputEncoder).
- GeoJSON export: one RFC 7946 Feature per row
  (/root/reference/geomesa-spark/geomesa-spark-core/src/main/scala/org/
  locationtech/geomesa/spark/SpatialRDD.scala:59-73).
- Arrow export: Spark is Arrow-native — ``df.toArrow()`` covers ArrowScan
  (/root/reference/geomesa-index-api/.../iterators/ArrowScan.scala).
- ConvexHull aggregate: the reference's UDAF (/root/reference/
  geomesa-spark/geomesa-spark-jts/src/main/scala/org/locationtech/
  geomesa/spark/jts/udaf/ConvexHull.scala:16-51) as a two-phase
  salt -> partial hull -> merge hull program: associative, bounded
  per-task state, no giant collect_list on hot groups.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def to_bin_records(df: DataFrame, *, track: str, ts: str = "ts",
                   lon: str = "lon", lat: str = "lat",
                   label: str | None = None,
                   passthrough: tuple[str, ...] = (),
                   emit_fields: bool = False) -> DataFrame:
    """Encode rows into BIN records: (track_hash, payload binary).

    track id = crc32 of the UTF-8 track string as int32 — a pinned,
    documented hash, stable across pandas/python versions (the reference
    uses value.hashCode, equally a fixed function of the string); dtg =
    epoch seconds int32;
    lat/lon float32 little-endian. Output column ``bin`` is 16 (or 24 with
    label) bytes per row; downstream concatenation yields the wire format.

    ``passthrough`` columns are carried alongside each record (the
    reference keeps feature ids with BIN rows in sorted mode);
    ``emit_fields=True`` additionally emits the decoded record fields
    (``secs`` int, ``lat32``/``lon32`` float) so the packed values can be
    cross-checked against an external recomputation.
    """
    fmt = "<iiff" + ("8s" if label else "")
    pt = list(passthrough)
    pt_schema = "".join(
        f"{f.name} {f.dataType.simpleString()}, "
        for f in df.schema.fields if f.name in pt)
    fields_schema = ("secs int, lat32 float, lon32 float, "
                     if emit_fields else "")
    out_schema = f"{pt_schema}{fields_schema}track_hash int, bin binary"
    cols = pt + [track, ts, lon, lat] + ([label] if label else [])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            th = pdf[track].astype(str).map(
                lambda s: zlib.crc32(s.encode("utf-8"))) \
                .to_numpy(dtype=np.uint32).astype(np.int32)
            secs = (pdf[ts].astype("int64") // 1_000_000_000).astype(np.int32)
            la = pdf[lat].astype(np.float32)
            lo = pdf[lon].astype(np.float32)
            if label:
                lab = pdf[label].astype(str).str.encode("utf-8") \
                    .str.slice(0, 8)
                recs = [struct.pack(fmt, int(a), int(b), float(c), float(d),
                                    e.ljust(8, b"\0"))
                        for a, b, c, d, e in zip(th, secs, la, lo, lab)]
            else:
                recs = [struct.pack(fmt, int(a), int(b), float(c), float(d))
                        for a, b, c, d in zip(th, secs, la, lo)]
            out = {c: pdf[c].to_numpy() for c in pt}
            if emit_fields:
                out.update({"secs": secs, "lat32": la, "lon32": lo})
            out.update({"track_hash": th, "bin": recs})
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(encode, out_schema)


def to_arrow_ipc_partitions(df: DataFrame,
                            dictionary_cols: tuple[str, ...] = ()
                            ) -> DataFrame:
    """Distributed Arrow IPC export with dictionary-encoded columns — the
    ArrowScan shape (/root/reference/geomesa-index-api/src/main/scala/org/
    locationtech/geomesa/index/iterators/ArrowScan.scala): every scan
    partition emits its rows as ONE serialized Arrow IPC stream whose
    ``dictionary_cols`` are dictionary(int32 -> value) encoded (per-batch
    dictionaries, like the reference's per-scan dictionaries), and the
    client reduces the partial streams (``arrow_ipc_reduce``) into one
    stream with unified dictionaries.

    Output: one row per non-empty partition, (n_rows long, ipc binary).
    The heavy encode work is distributed; only the compact encoded bytes
    move to the driver.
    """
    import pyarrow as pa

    dcols = tuple(dictionary_cols)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        table = pa.Table.from_pandas(pd.concat(pdfs, ignore_index=True),
                                     preserve_index=False)
        arrays = []
        fields = []
        for i, name in enumerate(table.column_names):
            col = table.column(i)
            if name in dcols:
                col = col.dictionary_encode()
            arrays.append(col)
            fields.append(pa.field(name, col.type))
        out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, out.schema) as w:
            w.write_table(out)
        yield pd.DataFrame({"n_rows": [len(out)],
                            "ipc": [sink.getvalue().to_pybytes()]})

    return df.mapInPandas(encode, "n_rows long, ipc binary")


def to_arrow_ipc_delta(df: DataFrame,
                       dictionary_cols: tuple[str, ...] = ()
                       ) -> DataFrame:
    """Arrow IPC export in the reference's DELTA-dictionary mode
    (ArrowScan's batch aggregation with growing dictionaries,
    /root/reference/geomesa-index-api/src/main/scala/org/locationtech/
    geomesa/index/iterators/ArrowScan.scala — the DeltaAggregate form):
    each partition streams its incoming Arrow batches as SEPARATE record
    batches; a ``dictionary_cols`` dictionary only ever grows, and batches
    after the first carry just the NEW values as IPC dictionary-delta
    messages instead of re-sending the whole dictionary.

    Compared to ``to_arrow_ipc_partitions`` (one batch per partition),
    this is the shape for long scans delivering results incrementally:
    constant memory per batch, no per-partition concat, and the encoded
    dictionary bytes are proportional to NEW values seen, not values
    re-seen. ``arrow_ipc_reduce`` consumes either form unchanged.
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    dcols = tuple(dictionary_cols)
    # stream schema DECLARED from the Spark schema, not inferred from the
    # first non-empty batch: an all-null column in that batch would infer
    # pa.null() and typed later batches would fail the cast, and a
    # drifting dictionary value type would hit DictionaryArray casts that
    # can throw — with a declared schema every batch coerces to the same
    # types up front
    spark_arrow = to_arrow_schema(df.schema)
    declared = pa.schema([
        pa.field(f.name, pa.dictionary(pa.int32(), f.type))
        if f.name in dcols else f
        for f in spark_arrow])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # built per-task: IpcWriteOptions is not cloudpickle-able
        opts = pa.ipc.IpcWriteOptions(emit_dictionary_deltas=True)
        lookup: dict[str, dict] = {c: {} for c in dcols}
        values: dict[str, list] = {c: [] for c in dcols}
        writer = None
        sink = None
        n_rows = 0
        for pdf in batches:
            if not len(pdf):
                continue
            arrays = []
            for field in declared:
                name = field.name
                raw = pdf[name]
                if name in dcols:
                    look, vals = lookup[name], values[name]
                    for v in pd.unique(raw.dropna()):
                        if v not in look:
                            look[v] = len(vals)
                            vals.append(v)
                    mask = raw.isna().to_numpy()
                    idx = raw.map(look).to_numpy(dtype="float64",
                                                 na_value=-1)
                    col = pa.DictionaryArray.from_arrays(
                        pa.array(idx.astype("int32"), type=pa.int32(),
                                 mask=mask),
                        pa.array(vals, type=field.type.value_type))
                else:
                    col = pa.Array.from_pandas(raw, type=field.type)
                arrays.append(col)
            if writer is None:
                sink = pa.BufferOutputStream()
                writer = pa.ipc.new_stream(sink, declared, options=opts)
            writer.write_batch(
                pa.record_batch(arrays, schema=declared))
            n_rows += len(pdf)
        if writer is None:
            return
        writer.close()
        yield pd.DataFrame({"n_rows": [n_rows],
                            "ipc": [sink.getvalue().to_pybytes()]})

    return df.mapInPandas(encode, "n_rows long, ipc binary")


def arrow_ipc_reduce(parts: list[bytes],
                     sort_by: str | None = None) -> bytes:
    """Client-side reduce of per-partition IPC streams into one stream
    with UNIFIED dictionaries (the reference's client merge phase,
    ArrowScan.mergeBatches).

    With ``sort_by``, the partitions must each be PRE-SORTED by that
    column (the reference's sorted-delivery mode): the reduce runs a
    vectorized K-WAY MERGE — a searchsorted-interleave tree, O(n log k),
    no full re-sort — and the output stream is globally sorted, stable
    across equal keys in partition order."""
    import pyarrow as pa

    tables = []
    for blob in parts:
        with pa.ipc.open_stream(pa.BufferReader(bytes(blob))) as r:
            tables.append(r.read_all())
    merged = pa.concat_tables(tables, promote_options="permissive")
    merged = merged.unify_dictionaries()
    if sort_by is not None and merged.num_rows:
        merged = merged.take(pa.array(_kway_merge_indices(
            tables, sort_by)))
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, merged.schema) as w:
        w.write_table(merged)
    return sink.getvalue().to_pybytes()


def _kway_merge_indices(tables, key: str) -> np.ndarray:
    """Permutation of global (concatenated) row indices that merges the
    per-table pre-sorted runs: pairwise vectorized merges
    (np.searchsorted interleave) reduced as a tree — O(n log k)."""
    runs = []
    off = 0
    for t in tables:
        col = t.column(key)
        if hasattr(col.type, "value_type"):  # dictionary-encoded key
            col = col.cast(col.type.value_type)
        keys = col.to_numpy(zero_copy_only=False)
        runs.append((keys, np.arange(off, off + len(t), dtype=np.int64)))
        off += len(t)
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            (ka, ia), (kb, ib) = runs[i], runs[i + 1]
            # stable: equal keys keep earlier-partition rows first
            pos_b = np.searchsorted(ka, kb, side="right") \
                + np.arange(len(kb), dtype=np.int64)
            n = len(ka) + len(kb)
            keys = np.empty(n, dtype=ka.dtype)
            idx = np.empty(n, dtype=np.int64)
            mask = np.zeros(n, dtype=bool)
            mask[pos_b] = True
            keys[mask], keys[~mask] = kb, ka
            idx[mask], idx[~mask] = ib, ia
            nxt.append((keys, idx))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return runs[0][1]


def to_geojson_features(df: DataFrame, *, lon: str = "lon",
                        lat: str = "lat",
                        id_col: str | None = None) -> DataFrame:
    """One GeoJSON Feature string per row; all non-geometry columns become
    properties (SpatialRDD.toGeoJSON semantics). Pure JVM for the geometry;
    property assembly via to_json."""
    props = [c for c in df.columns if c not in (lon, lat)]
    feature = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        *([F.col(id_col).alias("id")] if id_col else []),
        F.struct(F.lit("Point").alias("type"),
                 F.array(F.col(lon), F.col(lat)).alias("coordinates")
                 ).alias("geometry"),
        F.struct(*[F.col(c) for c in props]).alias("properties")))
    return df.select(feature.alias("geojson"))


def _hull_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull (CCW, collinear vertices dropped).
    Scalar-float inner loop — numpy 2-vector ops cost microseconds per
    call and dominate for the many-small-groups case."""
    pts = np.unique(np.column_stack([x, y]), axis=0)  # sorted lex
    if len(pts) <= 2:
        return pts
    plist = [(float(a), float(b)) for a, b in pts]

    def half(p):
        out = []
        for (vx, vy) in p:
            while len(out) >= 2:
                (ax, ay), (bx, by) = out[-2], out[-1]
                if (bx - ax) * (vy - ay) - (by - ay) * (vx - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append((vx, vy))
        return out
    lower = half(plist)
    upper = half(plist[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _hull_wkt(h: np.ndarray) -> str:
    # %.17g: exact double round-trip — hull vertices must equal input
    # coordinates bit-for-bit or boundary point-in-polygon tests break
    if len(h) == 1:
        return f"POINT ({h[0, 0]:.17g} {h[0, 1]:.17g})"
    if len(h) == 2:
        return (f"LINESTRING ({h[0, 0]:.17g} {h[0, 1]:.17g}, "
                f"{h[1, 0]:.17g} {h[1, 1]:.17g})")
    ring = ", ".join(f"{a:.17g} {b:.17g}" for a, b in h)
    return f"POLYGON (({ring}, {h[0, 0]:.17g} {h[0, 1]:.17g}))"


def convex_hull_agg(df: DataFrame, *, group_cols: list[str] | None = None,
                    lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Convex hull of the points in each group, as WKT.

    Matches the reference UDAF's incremental union().convexHull()
    semantics with associative merges, shaped for many small-to-medium
    groups without per-group task overhead:

      1. map-side partial hulls per group within each Arrow batch
         (``mapInPandas`` — no shuffle, no per-group Spark task), then
      2. JVM ``collect_list`` merge of the partial vertex arrays (the only
         shuffle; partial hulls bound each group's state), then
      3. one vectorized scalar pandas UDF computing the final hull per
         group — whole batches of groups per Python call.
    """
    group_cols = group_cols or []
    gtypes = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields if f.name in group_cols)
    sep = ", " if gtypes else ""
    mid_schema = f"{gtypes}{sep}xs array<double>, ys array<double>"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            groups = (pdf.groupby(group_cols, sort=False)
                      if group_cols else [((), pdf)])
            for key, g in groups:
                h = _hull_xy(g[lon].to_numpy(np.float64),
                             g[lat].to_numpy(np.float64))
                key = key if isinstance(key, tuple) else (key,)
                rows.append({**dict(zip(group_cols, key)),
                             "xs": h[:, 0].tolist(),
                             "ys": h[:, 1].tolist()})
            yield pd.DataFrame(rows)

    @F.pandas_udf("string")
    def final_hull(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series([
            _hull_wkt(_hull_xy(np.asarray(x, dtype=np.float64),
                               np.asarray(y, dtype=np.float64)))
            for x, y in zip(xs, ys)])

    cols = group_cols + [lon, lat]
    mid = df.select(*cols).mapInPandas(partials, mid_schema)
    merged = (mid.groupBy(*[F.col(c) for c in group_cols]
                          if group_cols else [F.lit(1).alias("__g__")])
              .agg(F.flatten(F.collect_list("xs")).alias("xs"),
                   F.flatten(F.collect_list("ys")).alias("ys")))
    out = merged.withColumn("hull_wkt", final_hull("xs", "ys")) \
        .drop("xs", "ys")
    return out.drop("__g__") if not group_cols else out
