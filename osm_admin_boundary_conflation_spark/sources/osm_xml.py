"""OSM XML source (S3): .osm → nodes/ways/relations DataFrames.

Reference: load_osm (conflate.py:22-62) parses the whole file into
nested dicts on one machine. Spark-native shape: split the document
into per-element chunks and parse each chunk in parallel with
mapInPandas (element boundaries in .osm are line-aligned top-level
tags, so a line-oriented text scan distributes; each executor parses
only its elements with ElementTree).

Output schemas (FIXTURES.md F3):
  nodes(id long, lat double, lon double, tags map<string,string>)
  ways(id long, node_ids array<long>, tags map<string,string>)
  relations(id long, members array<struct<ref long, role string,
            type string>>, tags map<string,string>)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

NODE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("tags", MapType(StringType(), StringType())),
    ]
)
WAY_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("node_ids", ArrayType(LongType())),
        StructField("tags", MapType(StringType(), StringType())),
    ]
)
MEMBER_TYPE = StructType(
    [
        StructField("ref", LongType()),
        StructField("role", StringType()),
        StructField("type", StringType()),
    ]
)
REL_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("members", ArrayType(MEMBER_TYPE)),
        StructField("tags", MapType(StringType(), StringType())),
    ]
)

_ELEM_RE = re.compile(r"<(node|way|relation)\b[^>]*?(?:/>|>.*?</\1>)", re.DOTALL)


def _read_elements(spark: SparkSession, path: str) -> DataFrame:
    """One row per top-level OSM element (self-closing or block)."""
    raw = spark.read.text(path, wholetext=True)

    def split_elems(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for doc in pdf["value"]:
                elems = [m.group(0) for m in _ELEM_RE.finditer(doc or "")]
                if elems:
                    yield pd.DataFrame({"xml": elems})

    elems = raw.mapInPandas(split_elems, StructType([StructField("xml", StringType())]))
    # distribute parse work across the cluster (wholetext yields one
    # input partition; real planet files would arrive pre-split)
    return elems.repartition(spark.sparkContext.defaultParallelism)


def _tags(el) -> dict:
    return {t.attrib["k"]: t.attrib["v"] for t in el.iter("tag")}


def load_osm(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """.osm file → {'nodes': DF, 'ways': DF, 'relations': DF}."""
    elems = _read_elements(spark, path).cache()

    def parse_nodes(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for x in pdf["xml"]:
                if not x.startswith("<node"):
                    continue
                el = ET.fromstring(x)
                rows.append(
                    (int(el.attrib["id"]), float(el.attrib["lat"]), float(el.attrib["lon"]), _tags(el))
                )
            if rows:
                yield pd.DataFrame(rows, columns=["id", "lat", "lon", "tags"])

    def parse_ways(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for x in pdf["xml"]:
                if not x.startswith("<way"):
                    continue
                el = ET.fromstring(x)
                nds = [int(nd.attrib["ref"]) for nd in el.iter("nd")]
                rows.append((int(el.attrib["id"]), nds, _tags(el)))
            if rows:
                yield pd.DataFrame(rows, columns=["id", "node_ids", "tags"])

    def parse_rels(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for x in pdf["xml"]:
                if not x.startswith("<relation"):
                    continue
                el = ET.fromstring(x)
                members = [
                    {"ref": int(m.attrib["ref"]), "role": m.attrib.get("role", ""), "type": m.attrib.get("type", "")}
                    for m in el.iter("member")
                ]
                rows.append((int(el.attrib["id"]), members, _tags(el)))
            if rows:
                yield pd.DataFrame(rows, columns=["id", "members", "tags"])

    return {
        "nodes": elems.mapInPandas(parse_nodes, NODE_SCHEMA),
        "ways": elems.mapInPandas(parse_ways, WAY_SCHEMA),
        "relations": elems.mapInPandas(parse_rels, REL_SCHEMA),
    }
