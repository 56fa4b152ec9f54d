"""Size competitiveness vs standard Parquet (the '<= reference compressed
size' criterion made measurable: the reference IS a Parquet implementation,
so pyarrow's uncompressed Parquet output on the same columns is the
concrete stand-in for reference-encoded size — its write path being
unimplemented, layout/page.go:23-27).

Auto-selected chunks must beat the Parquet total across a representative
column mix, and must never exceed any single column's Parquet size by more
than the framing epsilon.
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pysparkenc import chunk as chunklib

LINEITEM = "/root/testdata/sf0.01/lineitem.parquet"
DOCUMENTS = "/root/testdata/sf0.01/documents.parquet"


def parquet_column_size(arr: pa.ChunkedArray | pa.Array) -> int:
    t = pa.table({"c": arr})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none", use_dictionary=True,
                   write_statistics=False)
    empty = io.BytesIO()
    pq.write_table(t.slice(0, 0), empty, compression="none",
                   write_statistics=False)
    return buf.getbuffer().nbytes - empty.getbuffer().nbytes


def our_numeric(name: str, vals: np.ndarray, dtype: str) -> int:
    return chunklib.encode_numeric(name, vals, dtype).enc_bytes


def our_bytes(name: str, col: pa.ChunkedArray) -> int:
    ba = col.combine_chunks().cast(pa.large_binary())
    bufs = ba.buffers()
    off = np.frombuffer(bufs[1], np.int64, len(ba) + 1)
    data = bytes(memoryview(bufs[2])[: off[-1]])
    return chunklib.encode_bytes(name, off, data).enc_bytes


@pytest.fixture(scope="module")
def li():
    return pq.read_table(LINEITEM)


def test_total_beats_parquet(li):
    docs = pq.read_table(DOCUMENTS)
    ours = parquet = 0
    for name, dtype in (
        ("l_orderkey", "int64"), ("l_partkey", "int64"),
        ("l_suppkey", "int64"), ("l_linenumber", "int32"),
        ("l_quantity", "float64"), ("l_extendedprice", "float64"),
        ("l_discount", "float64"), ("l_tax", "float64"),
    ):
        vals = li.column(name).to_numpy().astype(dtype)
        ours += our_numeric(name, vals, dtype)
        parquet += parquet_column_size(li.column(name))
    for tbl, name in ((li, "l_returnflag"), (li, "l_linestatus"),
                      (docs, "text"), (docs, "source")):
        ours += our_bytes(name, tbl.column(name))
        parquet += parquet_column_size(tbl.column(name))
    assert ours < parquet, f"{ours} >= {parquet}"


@pytest.mark.parametrize(
    "name,dtype",
    [("l_orderkey", "int64"), ("l_linenumber", "int32"),
     ("l_quantity", "float64"), ("l_extendedprice", "float64")],
)
def test_numeric_column_never_much_worse(li, name, dtype):
    vals = li.column(name).to_numpy().astype(dtype)
    ours = our_numeric(name, vals, dtype)
    parquet = parquet_column_size(li.column(name))
    assert ours <= parquet * 1.02 + 256  # framing epsilon


@pytest.mark.parametrize("name", ["l_returnflag", "l_linestatus"])
def test_string_column_never_much_worse(li, name):
    ours = our_bytes(name, li.column(name))
    parquet = parquet_column_size(li.column(name))
    assert ours <= parquet * 1.02 + 256


def test_text_beats_snappy_parquet():
    """The lightweight codecs alone (here FSST on document text, no block
    compression) must beat *snappy-compressed* Parquet, not just
    uncompressed — snappy finds the same word repetitions FSST does, so
    this pins that the symbol table actually earns its keep."""
    docs = pq.read_table(DOCUMENTS)
    ours = our_bytes("text", docs.column("text"))
    t = pa.table({"c": docs.column("text")})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy", write_statistics=False)
    assert ours < buf.getbuffer().nbytes, (
        f"fsst {ours} >= snappy parquet {buf.getbuffer().nbytes}"
    )
