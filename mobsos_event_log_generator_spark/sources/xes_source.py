"""First-class XES data source via the Spark 4 Python Data Source API.

``spark.read.format("xes").load(dir)`` over the sharded XES layout the sink
writes (sinks/xes.py::write_xes with ``single_file=False``) — the read-back
pair of S5 (reference app.py:216-217 produces these files; this makes them a
queryable table). One input partition per ``.xes`` shard: XML has no split
points, so the file is the parallelism unit — which is exactly why the scale
path writes shards. Output schema matches ``read_xes_distributed`` (one row
per event, values as strings plus an attr→XES-type map for lossless
re-typing), so both readers are interchangeable and share tests.

Compared to the binaryFile+mapInPandas reader, the DataSource form gives the
engine a real table abstraction: it composes with ``spark.read`` options,
shows up in scan nodes, and needs no helper import at the call site once
``register_xes_source`` has run for the session.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

XES_SOURCE_SCHEMA = (
    "trace string, activity string, ts string, "
    "attrs map<string,string>, attr_types map<string,string>"
)

_VALUE_TAGS = ("string", "date", "int", "float", "boolean")


class XESPartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


class XESReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("xes source requires a path: spark.read.format('xes').load(dir)")
        self.path = path

    def partitions(self):
        if os.path.isfile(self.path):
            files = [self.path]
        else:
            files = sorted(glob.glob(os.path.join(self.path, "*.xes")))
        if not files:
            raise FileNotFoundError(f"no .xes files under {self.path!r}")
        return [XESPartition(f) for f in files]

    def read(self, partition: XESPartition):
        import xml.etree.ElementTree as ET

        ns = {"x": "http://www.xes-standard.org/"}
        root = ET.parse(partition.file).getroot()

        def attrs_of(el):
            out, tags = {}, {}
            for child in el:
                tag = child.tag.split("}")[-1]
                if tag in _VALUE_TAGS:
                    out[child.get("key")] = child.get("value")
                    tags[child.get("key")] = tag
            return out, tags

        for tr in root.findall("x:trace", ns) or root.findall("trace"):
            t_attrs, _ = attrs_of(tr)
            trace_id = t_attrs.get("concept:name", "")
            for ev in tr.findall("x:event", ns) or tr.findall("event"):
                a, tags = attrs_of(ev)
                yield (trace_id, a.get("concept:name"), a.get("time:timestamp"), a, tags)


class XESDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xes"

    def schema(self) -> str:
        return XES_SOURCE_SCHEMA

    def reader(self, schema) -> XESReader:
        return XESReader(self.options)


def register_xes_source(spark) -> None:
    """Idempotent per-session registration of the 'xes' format."""
    spark.dataSource.register(XESDataSource)
