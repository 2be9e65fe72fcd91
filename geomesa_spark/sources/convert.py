"""Ingest converters: raw delimited/JSON/fixed-width files -> a declared
feature schema.

Reference semantics (geomesa-convert, /root/reference/geomesa-convert/*;
provider wiring ConverterSpatialRDDProvider.scala:44-81): data never
infers its schema — a converter definition declares the target
SimpleFeatureType and per-field expressions mapping raw columns onto it,
with a validation mode deciding what happens to non-conforming records
(skip vs raise, the reference's parse-mode option).

Spark mapping: converter definition -> a plain DataFrame program
(``spark.read.csv/json/text`` + Catalyst expressions). Field transforms
are SQL expression strings, so everything stays JVM-side; error handling
uses the try_* expression family so bad rows become NULLs that the
validation mode then routes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


@dataclass
class Field:
    """One target attribute: name, Spark SQL type, and the transform
    expression over the raw columns (raw csv columns are _c0.._cN)."""
    name: str
    dtype: str
    expr: str


@dataclass
class Converter:
    """Declared mapping from a raw source onto a feature schema.

    ``mode``: 'skip' drops records whose non-nullable fields fail to
    convert (parse-mode skip); 'raise' fails the job on the first bad
    record (parse-mode raise-errors).
    """
    fields: list[Field]
    id_field: str | None = None
    required: list[str] = field(default_factory=list)
    mode: str = "skip"

    # ----------------------------------------------------------- sources

    def from_csv(self, spark: SparkSession, path_or_df, *,
                 delimiter: str = ",", header: bool = False) -> DataFrame:
        raw = (path_or_df if isinstance(path_or_df, DataFrame)
               else spark.read.option("delimiter", delimiter)
               .option("header", str(header).lower()).csv(path_or_df))
        return self._apply(raw)

    def from_json(self, spark: SparkSession, path_or_df,
                  schema: str | None = None) -> DataFrame:
        if isinstance(path_or_df, DataFrame):
            raw = path_or_df
        else:
            r = spark.read
            if schema:
                r = r.schema(schema)
            raw = r.json(path_or_df)
        return self._apply(raw)

    def from_orc(self, spark: SparkSession, path_or_df) -> DataFrame:
        """ORC source (built-in Spark data source; the reference's
        geomesa-convert parquet/orc family)."""
        raw = (path_or_df if isinstance(path_or_df, DataFrame)
               else spark.read.orc(path_or_df))
        return self._apply(raw)

    def from_parquet(self, spark: SparkSession, path_or_df) -> DataFrame:
        """Parquet source (geomesa-convert parquet module): raw columns
        are the parquet schema's own names; field exprs re-map them onto
        the declared feature schema with the same validation modes."""
        raw = (path_or_df if isinstance(path_or_df, DataFrame)
               else spark.read.parquet(path_or_df))
        return self._apply(raw)

    def from_jdbc(self, spark: SparkSession, url: str, table: str, *,
                  properties: dict | None = None,
                  partition_column: str | None = None,
                  lower_bound=None, upper_bound=None,
                  num_partitions: int | None = None) -> DataFrame:
        """JDBC source (geomesa-convert JDBC converter). Delegates to
        Spark's built-in JDBC datasource; pass ``partition_column`` +
        bounds to parallelize the read (one task per id-range slice —
        required for any table that doesn't fit one executor). No JDBC
        driver jar ships in this container, so this is exercised only
        when a driver is on the classpath (documented env gate, like the
        Kafka broker)."""
        r = (spark.read.format("jdbc")
             .option("url", url).option("dbtable", table))
        for k, v in (properties or {}).items():
            r = r.option(k, v)
        if partition_column is not None:
            r = (r.option("partitionColumn", partition_column)
                 .option("lowerBound", str(lower_bound))
                 .option("upperBound", str(upper_bound))
                 .option("numPartitions", str(num_partitions or 8)))
        return self._apply(r.load())

    def from_avro(self, spark: SparkSession, path_or_df) -> DataFrame:
        """Avro object-container source. The spark-avro jar is absent in
        this environment, so files are read distributed via binaryFile +
        the pure-Python container decoder (sources/avro.py) — flat
        primitive records, null/deflate codecs."""
        if isinstance(path_or_df, DataFrame):
            raw = path_or_df
        else:
            from geomesa_spark.sources.avro import read_avro
            raw = read_avro(spark, path_or_df)
        return self._apply(raw)

    def from_avro_registry(self, spark: SparkSession, path_or_df,
                           registry: dict[int, dict], *,
                           reader_schema_id: int | None = None) -> DataFrame:
        """Confluent-framed avro source with schema-registry evolution
        (geomesa-convert-avro-schema-registry parity; a live registry
        service is env-blocked, so ``registry`` is the id->schema map the
        client would cache). See sources/avro.py:read_avro_registry."""
        from geomesa_spark.sources.avro import read_avro_registry
        return self._apply(read_avro_registry(
            spark, path_or_df, registry,
            reader_schema_id=reader_schema_id))

    def from_xml(self, spark: SparkSession, path: str, *,
                 record_tag: str,
                 xpaths: dict[str, str]) -> DataFrame:
        """XML source (geomesa-convert-xml parity): each file is parsed
        distributed (binaryFile + stdlib ElementTree); one raw row per
        ``record_tag`` element; ``xpaths`` maps raw column names onto
        ElementPath expressions evaluated relative to the record element
        ('@attr' reads an attribute, anything else is findtext)."""
        from collections.abc import Iterator

        import pandas as pd

        cols = list(xpaths.items())

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import xml.etree.ElementTree as ET
            for pdf in batches:
                rows = []
                for blob in pdf["content"]:
                    root = ET.fromstring(bytes(blob).decode("utf-8"))
                    matches = ([root] if root.tag == record_tag
                               else root.iter(record_tag))
                    for el in matches:
                        row = {}
                        for name, xp in cols:
                            if xp.startswith("@"):
                                row[name] = el.get(xp[1:])
                            elif xp == ".":
                                row[name] = (el.text or "").strip() or None
                            else:
                                row[name] = el.findtext(xp)
                        rows.append(row)
                if rows:
                    yield pd.DataFrame(rows,
                                       columns=[n for n, _ in cols])

        raw = (spark.read.format("binaryFile")
               .option("pathGlobFilter", "*.xml").load(path)
               .select("content")
               .mapInPandas(parse, ", ".join(
                   f"{n} string" for n, _ in cols)))
        return self._apply(raw)

    def from_shapefile(self, spark: SparkSession, path: str) -> DataFrame:
        """Shapefile source (.shp + .dbf pairs) via the pure-Python ESRI
        readers (sources/shapefile.py — GDAL/pyshp absent here). Raw
        columns: geom (WKB binary), attrs_json (string), stem, idx."""
        from geomesa_spark.sources.shapefile import read_shapefile
        return self._apply(read_shapefile(spark, path))

    def from_fixed_width(self, spark: SparkSession, path_or_df,
                         widths: list[tuple[str, int, int]]) -> DataFrame:
        """widths = [(raw_name, start_1_based, length), ...] over a text
        file; substring slots become the raw columns."""
        raw = (path_or_df if isinstance(path_or_df, DataFrame)
               else spark.read.text(path_or_df))
        cols = [F.trim(F.substring("value", s, ln)).alias(n)
                for (n, s, ln) in widths]
        return self._apply(raw.select(*cols))

    # ------------------------------------------------------------- apply

    def _apply(self, raw: DataFrame) -> DataFrame:
        out_cols: list[Column] = []
        for f in self.fields:
            c = F.expr(f.expr).cast(f.dtype).alias(f.name)
            out_cols.append(c)
        out = raw.select(*out_cols)
        required = self.required or [f.name for f in self.fields]
        ok = None
        for name in required:
            cond = F.col(name).isNotNull()
            ok = cond if ok is None else (ok & cond)
        if self.mode == "skip":
            return out.where(ok) if ok is not None else out
        if self.mode == "raise":
            # assert_true returns NULL when the predicate holds and raises
            # otherwise; phrased as a filter so column pruning cannot
            # optimize the assertion away
            return out.where(F.assert_true(
                ok if ok is not None else F.lit(True),
                F.lit("converter: record failed validation")).isNull())
        raise ValueError(f"unknown mode {self.mode!r}")


def image_manifest_converter() -> Converter:
    """Example converter for a CSV manifest of the image fixture shape:
    image_id,lon,lat,w,h,fmt,caption — the ingest-side declared mapping
    (analog of the reference's SFT spec strings)."""
    return Converter(
        fields=[
            Field("image_id", "string", "_c0"),
            Field("lon", "double", "try_cast(_c1 as double)"),
            Field("lat", "double", "try_cast(_c2 as double)"),
            Field("w", "int", "try_cast(_c3 as int)"),
            Field("h", "int", "try_cast(_c4 as int)"),
            Field("fmt", "string", "_c5"),
            Field("caption", "string", "_c6"),
        ],
        id_field="image_id",
        required=["image_id", "lon", "lat"],
    )
