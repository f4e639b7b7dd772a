"""Custom Python DataSource (Spark 4 API): seeded synthetic documents.

``spark.read.format("synthetic_docs")`` after registration — a
generator source for load/soak testing the curation pipeline without
any input I/O. The reader declares N input partitions, so generation
parallelizes across executors exactly like a file scan; every value is
a pure function of (seed, global row id) via md5, so reruns, retries,
and different partition counts over the same n_docs produce the same
corpus (same property the curation samplers rely on).

This demonstrates the idiomatic way to add a NEW source to Spark from
Python (pyspark.sql.datasource.DataSource / DataSourceReader /
InputPartition) — no JVM code, schema declared as DDL, rows yielded as
tuples, Arrow-batched by the runtime.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window join filter group order index plan shuffle"
).split()

_LANGS = ("en", "en", "en", "de", "fr")  # en-heavy mix


def _doc_for(seed: int, gid: int) -> tuple[int, str, str, str, int]:
    digest = hashlib.md5(f"{seed}:{gid}".encode()).digest()
    n_tokens = 8 + digest[0] % 9  # 8..16
    toks = [
        _VOCAB[digest[1 + (t % 15)] % len(_VOCAB)] if t < 15
        else _VOCAB[(digest[15] + t) % len(_VOCAB)]
        for t in range(n_tokens)
    ]
    text = " ".join(toks)
    lang = _LANGS[digest[2] % len(_LANGS)]
    source = f"src{digest[3] % 4}"
    return gid, text, lang, source, len(text)


class _Range(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 777))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_docs // self.n_partitions)  # ceil
        return [
            _Range(lo, min(lo + per, self.n_docs), self.seed)
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for gid in range(partition.start, partition.end):
            yield _doc_for(partition.seed, gid)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
