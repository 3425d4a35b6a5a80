"""WARC source: record framing round-trip, gzip members, warcinfo
skipping, and pipeline equivalence (WARC-read pages produce the same
extracted text as the direct page table)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sigraph_ray.sources.warc import (pages_to_warc_bytes,
                                      read_warc,
                                      records_from_warc_bytes)


def _pages(n: int) -> pd.DataFrame:
    from sigraph_ray.pipelines.kg import synth_pages

    df = synth_pages(n, parallelism=2).to_pandas()
    return df[["url", "warc_ts", "html"]]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip_bytes(ray_session, compress):
    df = _pages(25)
    blob = pages_to_warc_bytes(df, compress=compress)
    rows = records_from_warc_bytes(blob)
    assert len(rows) == 25                    # warcinfo skipped
    got = pd.DataFrame(rows)
    assert list(got["url"]) == list(df["url"])
    assert all(bytes(a) == bytes(b)
               for a, b in zip(got["html"], df["html"]))
    # WARC-Date second granularity: equal after floor to seconds
    want_ts = pd.to_datetime(df["warc_ts"]).dt.floor("s")
    assert list(got["warc_ts"]) == list(want_ts)


def test_warc_rejects_garbage():
    with pytest.raises(ValueError):
        records_from_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")


def test_read_warc_pipeline_equivalence(ray_session, tmp_path):
    """Pages read back from multi-file WARC must extract the same
    per-url text as the direct synthetic page table."""
    from sigraph_ray.stages.extract import extract_text_batch

    df = _pages(40)
    d = tmp_path / "warc"
    d.mkdir()
    for i, part in enumerate(np.array_split(np.arange(len(df)), 3)):
        (d / f"seg-{i}.warc.gz").write_bytes(
            pages_to_warc_bytes(df.iloc[part], compress=True))
    ds = read_warc(str(d))
    got = (ds.map_batches(extract_text_batch, batch_format="pyarrow")
           .to_pandas().sort_values("url").reset_index(drop=True))

    import pyarrow as pa

    from sigraph_ray.pipelines.kg import synth_pages

    direct = synth_pages(40, parallelism=2).to_pandas()
    want = (extract_text_batch(pa.Table.from_pandas(direct))
            .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])
