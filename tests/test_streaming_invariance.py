"""Microbatch-invariance, executed: the streaming oracle entries claim
their emitted results are independent of how the input files are sliced
into microbatches. Re-run each entry under different maxFilesPerTrigger
slicings (1 file per batch vs everything in one batch) and assert the
collected results are IDENTICAL — the executable form of the invariance
arguments in their docstrings."""

from __future__ import annotations

import pytest

from cassabon_spark.queries import extensions as ext
from cassabon_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    df = load_registry()[name].fn(spark, SF)
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize(
    "name",
    [
        "streaming_session_window",
        "streaming_sliding_window",
        "streaming_neardup_lsh",
        "streaming_dedup_distinct",
        "streaming_topk_tokens",
    ],
)
def test_slicing_invariance(spark, name):
    results = []
    for files_per_trigger in (1, 8):
        ext._STREAM_FILES_PER_TRIGGER[0] = files_per_trigger
        try:
            results.append(_rows(spark, name))
        finally:
            ext._STREAM_FILES_PER_TRIGGER[0] = 2
    assert results[0] == results[1], (
        f"{name}: results differ between 1-file and 8-file microbatches"
    )
    assert len(results[0]) > 0  # non-vacuous at sf0.001
